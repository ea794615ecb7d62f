package graft

import java.time.Instant
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.caic.{CaicJob, GraftConfig}

/** Job-level contracts: the typed input config (§2A-20, task.ts:63-67 +
  * the reference README's ETL_API/ETL_LAYER env contract) and the
  * source URLs' pushed-down predicates (§2A-3/18, task.ts:88-102). */
class CaicJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def clearConf(): Unit =
    Seq("spark.graft.debug", "spark.graft.api", "spark.graft.layer")
      .foreach(spark.conf.unset)

  test("config defaults match the reference schema (DEBUG=false)") {
    clearConf()
    assert(GraftConfig.resolve(spark, env = Map.empty) ===
      GraftConfig(debug = false, api = GraftConfig.DefaultApi, layer = GraftConfig.DefaultLayer))
  }

  test("environment supplies DEBUG/ETL_API/ETL_LAYER") {
    clearConf()
    val cfg = GraftConfig.resolve(spark,
      env = Map("DEBUG" -> "true", "ETL_API" -> "http://etl:5001", "ETL_LAYER" -> "19"))
    assert(cfg === GraftConfig(debug = true, api = "http://etl:5001", layer = "19"))
  }

  test("session conf overrides the environment") {
    clearConf()
    spark.conf.set("spark.graft.layer", "42")
    val cfg = GraftConfig.resolve(spark, env = Map("ETL_LAYER" -> "19"))
    assert(cfg.layer === "42")
    clearConf()
  }

  test("malformed DEBUG fails fast like schema validation") {
    clearConf()
    intercept[IllegalArgumentException] {
      GraftConfig.resolve(spark, env = Map("DEBUG" -> "yes"))
    }
  }

  test("urls() pushes the source predicates into both requests (task.ts:88-102)") {
    val now = Instant.parse("2026-01-05T12:30:00Z")
    val (areasUrl, productsUrl) = CaicJob.urls(now)
    val encNow = java.net.URLEncoder.encode(now.toString, "UTF-8")
    for (u <- Seq(areasUrl, productsUrl)) {
      assert(u.contains("includeExpired%3Dfalse"), u)
      assert(u.contains(s"datetime%3D$encNow"), u)
      assert(u.startsWith("https://avalanche.state.co.us/api-proxy/avid?_api_proxy_uri="), u)
    }
    // productType is pushed on the areas call ONLY
    assert(areasUrl.contains("productType%3Davalancheforecast"))
    assert(!productsUrl.contains("productType"))
    // the ISO instant's ':' characters are URL-encoded, never raw
    assert(encNow.contains("%3A") && !areasUrl.substring(60).contains(":"))
  }
}
