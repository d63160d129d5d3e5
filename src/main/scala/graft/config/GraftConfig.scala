package graft.config

/** Typed, validated configuration — capability parity with the reference's
  * `config/StreamingLensConfig.scala:25-105`: same option keys (so a user of
  * the reference can switch without rewriting configs), case-insensitive
  * lookup, range-checked values.
  */
final case class GraftConfig(
    analysisIntervalMinutes: Int = 5,
    analysisMinBatches: Int = 1,
    criticalPathLowerThreshold: Double = 0.3,
    criticalPathUpperThreshold: Double = 0.7,
    maxResultsRetention: Int = 30,
    maxBatchesRetention: Int = 10,
    maxAnalysisTimeSeconds: Int = 5,
    maxRetries: Int = 3,
    shouldLogResults: Boolean = true,
    expectedMicroBatchSLAMillis: Long = 120000L,
    discountFactor: Double = 0.95,
    reportingIntervalMinutes: Int = 60,
    reporterClassName: Option[String] = None,
    reporterOptions: Map[String, String] = Map.empty) {

  require(analysisIntervalMinutes > 0, "analysisIntervalMinutes must be > 0")
  require(analysisMinBatches > 0, "analysisMinBatches must be > 0")
  require(criticalPathLowerThreshold > 0 && criticalPathLowerThreshold < 1,
    "criticalPathLowerThreshold must be in (0, 1)")
  require(criticalPathUpperThreshold > 0 && criticalPathUpperThreshold < 1,
    "criticalPathUpperThreshold must be in (0, 1)")
  require(criticalPathLowerThreshold < criticalPathUpperThreshold,
    "criticalPathLowerThreshold must be below criticalPathUpperThreshold")
  require(maxResultsRetention > 0, "maxResultsRetention must be > 0")
  require(maxBatchesRetention > 0, "maxBatchesRetention must be > 0")
  require(maxAnalysisTimeSeconds > 0, "maxAnalysisTimeSeconds must be > 0")
  require(maxRetries > 0, "maxRetries must be > 0")
  require(expectedMicroBatchSLAMillis > 0, "expectedMicroBatchSLAMillis must be > 0")
  require(discountFactor > 0 && discountFactor < 1, "discountFactor must be in (0, 1)")
  require(reportingIntervalMinutes > 0, "reportingIntervalMinutes must be > 0")
}

object GraftConfig {
  val Prefix = "streamingLens."

  /** Parse from an options map with case-insensitive keys
    * (ref `StreamingLensConfig.scala:23,29-65`). Unknown values raise
    * IllegalArgumentException naming the offending key. */
  def apply(options: Map[String, String]): GraftConfig = {
    val ci = options.map { case (k, v) => k.toLowerCase -> v }
    def get(key: String): Option[String] = ci.get((Prefix + key).toLowerCase)
    def num[T](key: String, parse: String => T, dflt: T): T =
      get(key).map { v =>
        try parse(v)
        // toBoolean throws IllegalArgumentException, the numerics throw
        // NumberFormatException — both must surface the offending key
        catch { case _: NumberFormatException | _: IllegalArgumentException =>
          throw new IllegalArgumentException(s"$Prefix$key: not a valid value: '$v'")
        }
      }.getOrElse(dflt)
    try GraftConfig(
      analysisIntervalMinutes = num("analysisIntervalMinutes", _.toInt, 5),
      analysisMinBatches = num("analysisMinBatches", _.toInt, 1),
      criticalPathLowerThreshold = num("criticalPathLowerThreshold", _.toDouble, 0.3),
      criticalPathUpperThreshold = num("criticalPathUpperThreshold", _.toDouble, 0.7),
      maxResultsRetention = num("maxResultsRetention", _.toInt, 30),
      maxBatchesRetention = num("maxBatchesRetention", _.toInt, 10),
      maxAnalysisTimeSeconds = num("maxAnalysisTimeSeconds", _.toInt, 5),
      maxRetries = num("maxRetries", _.toInt, 3),
      shouldLogResults = num("shouldLogResults", _.toBoolean, true),
      expectedMicroBatchSLAMillis = num("expectedMicroBatchSLAMillis", _.toLong, 120000L),
      discountFactor = num("reporter.discountFactor", _.toDouble, 0.95),
      reportingIntervalMinutes = num("reporter.intervalMinutes", _.toInt, 60),
      reporterClassName = get("reporter.className").filter(_.nonEmpty),
      // reporter options pass-through (ref StreamingLensConfig.scala:64-65)
      reporterOptions = options.filter(_._1.toLowerCase.contains("streaminglens.reporter")))
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(s"invalid streamingLens options: ${e.getMessage}")
    }
  }
}
