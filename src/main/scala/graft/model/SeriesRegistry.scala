package graft.model

/** Series registry — config-as-data, the reference's only configuration
  * surface (`/root/reference/src/config.py:28-52`; README.md:136-137 states
  * adding a series touches only these maps). The dimension table is derived
  * from this registry (graft.etl.Transforms.buildDimSeries).
  */
object SeriesRegistry {

  /** Human-readable name -> FRED technical series id. */
  val fredSeries: Seq[(String, String)] = Seq(
    "PCE_NOMINAL" -> "PCEC",
    "PCE_REAL" -> "PCECC96",
    "RETAIL_SALES" -> "RSXFS",
    "SENTIMENT" -> "UMCSENT",
    "CPI_ALL" -> "CPIAUCSL",
    "GDP_REAL" -> "GDPC1",
    "UNRATE" -> "UNRATE",
    "SAVINGS_RATE" -> "PSAVERT",
    "MONEY_COST" -> "FEDFUNDS")

  /** Human-readable name -> BLS technical series id. */
  val blsSeries: Seq[(String, String)] = Seq(
    "CPI_URBAN" -> "CUUR0000SA0",
    "CPI_CORE" -> "CUUR0000SA0L1E",
    "GAS_PRICE" -> "APU000074714",
    "AVG_WAGES" -> "CES0500000003",
    "WAGE_INDEX" -> "CIU2020000000000I")

  /** id -> name reverse lookup; unknown ids fall back to the id itself
    * (reference `src/transform.py:52,60`). */
  def idToName(pairs: Seq[(String, String)]): Map[String, String] =
    pairs.map(_.swap).toMap
}
