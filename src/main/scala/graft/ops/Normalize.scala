package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-normalization operators of the reference's KPI query, re-expressed as
  * pure `Column` transformations (fully codegen'd, no UDFs).
  *
  * Semantics from /root/reference/src/calcular_kpi.py:
  *  - endpoint normalization (P3): calcular_kpi.py:56-71 — strip the query
  *    string at the first '?', then collapse prefixed families
  *    `/status/...` → `/status`, `/basic-auth/...` → `/basic-auth`.
  *  - lenient casts (P4/P5): calcular_kpi.py:102-112 — uncastable
  *    status_code → 0, uncastable elapsed_ms → 0.0, and either failure forces
  *    parse_result to "error".
  *  - null-default string (P6): calcular_kpi.py:114 — null parse_result →
  *    "error".
  */
object Normalize {

  /** P3 — endpoint base: query-string strip + prefix collapse.
    * Contract documented at /root/reference/README.md:154-162. */
  def endpointBase(endpoint: Column): Column = {
    val noQuery = split(endpoint, "\\?", 2).getItem(0)
    when(noQuery.startsWith("/status/"), lit("/status"))
      .when(noQuery.startsWith("/basic-auth/"), lit("/basic-auth"))
      .otherwise(noQuery)
  }

  /** P4 — lenient int cast: null/uncastable → 0. Pair with [[castFailed]]. */
  def lenientInt(c: Column): Column = coalesce(c.try_cast("int"), lit(0))

  /** P5 — lenient double cast: null/uncastable → 0.0. */
  def lenientDouble(c: Column): Column = coalesce(c.try_cast("double"), lit(0.0))

  /** True when a raw value was present but did not cast — the condition that
    * forces parse_result := "error" (calcular_kpi.py:102-112). */
  def castFailed(raw: Column, castType: String): Column =
    raw.isNotNull && raw.try_cast(castType).isNull

  /** P6 + forced-error semantics: the effective parse_result. */
  def effectiveParseResult(parseResult: Column, anyCastFailed: Column): Column =
    when(anyCastFailed, lit("error"))
      .otherwise(coalesce(parseResult.cast("string"), lit("error")))
}
