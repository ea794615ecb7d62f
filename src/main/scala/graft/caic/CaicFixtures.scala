package graft.caic

/** Deterministic CAIC fixture documents (the reference ingests live HTTP
  * JSON — task.ts:89,102; tests and the driver's rows-only check run the
  * identical pipeline over these). Shapes mirror the real CAIC payloads:
  * forecast-area FeatureCollection + product array. */
object CaicFixtures {

  val areasJson: String =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","id":"NC-01","properties":{"name":"Front Range"},
      | "geometry":{"type":"Polygon","coordinates":[[[-105.6,40.0],[-105.2,40.0],[-105.2,40.4],[-105.6,40.0]]]}},
      |{"type":"Feature","id":"NC-02","properties":{"name":"Vail Summit"},
      | "geometry":{"type":"MultiPolygon","coordinates":[
      |  [[[-106.5,39.5],[-106.1,39.5],[-106.1,39.9],[-106.5,39.5]]],
      |  [[[-106.9,39.2],[-106.6,39.2],[-106.6,39.6],[-106.9,39.2]]]]}},
      |{"type":"Feature","id":3,"properties":{"name":"Sangre de Cristo"},
      | "geometry":{"type":"Polygon","coordinates":[[[-105.6,37.6],[-105.2,37.6],[-105.2,38.0],[-105.6,37.6]]]}}
      |]}""".stripMargin

  val productsJson: String =
    """[
      |{"type":"avalancheforecast","id":"p1","publicName":"Front Range Forecast",
      | "polygons":["NC-01"],"areaId":"NC-01","forecaster":"ab",
      | "issueDateTime":"2026-02-01T14:00:00Z","expiryDateTime":"2026-02-02T14:00:00Z",
      | "isTranslated":false,"weatherSummary":{"text":"snowy"},
      | "avalancheSummary":{"days":[{"date":"2026-02-01","content":"Wind slabs on NE aspects."}]},
      | "dangerRatings":{"days":[{"alp":"considerable","tln":"moderate","btl":"low"}]}},
      |{"type":"avalancheforecast","id":"p2","publicName":"Vail Summit Forecast",
      | "polygons":["NC-02"],"areaId":"NC-02","forecaster":"cd",
      | "issueDateTime":"2026-02-01T14:00:00Z","expiryDateTime":"2026-02-02T14:00:00Z",
      | "isTranslated":false,"weatherSummary":null,
      | "avalancheSummary":{"days":[{"date":"2026-02-01","content":"Storm slab cycle."}]},
      | "dangerRatings":{"days":[{"alp":"high","tln":"considerable","btl":"moderate"}]}},
      |{"type":"avalancheforecast","id":"p3","publicName":"Sangre Forecast",
      | "polygons":["3"],"areaId":"3","forecaster":"ef",
      | "issueDateTime":"2026-02-01T14:00:00Z","expiryDateTime":"2026-02-02T14:00:00Z",
      | "isTranslated":true,"weatherSummary":null,
      | "avalancheSummary":{"days":[{"date":"2026-02-01","content":"Isolated pockets."}]},
      | "dangerRatings":{"days":[{"alp":"low","tln":"low","btl":"low"}]}},
      |{"type":"regionaldiscussion","id":"p4","publicName":"State of the Snowpack"},
      |{"type":"avalancheforecast","id":"p5","publicName":"Expired Zone",
      | "polygons":["ZZ-99"],"areaId":"ZZ-99","forecaster":"gh",
      | "issueDateTime":"2026-02-01T14:00:00Z","expiryDateTime":"2026-02-02T14:00:00Z",
      | "isTranslated":false,"weatherSummary":null,
      | "avalancheSummary":{"days":[{"date":"2026-02-01","content":"n/a"}]},
      | "dangerRatings":{"days":[{"alp":"low","tln":"low","btl":"low"}]}}
      |]""".stripMargin
}
