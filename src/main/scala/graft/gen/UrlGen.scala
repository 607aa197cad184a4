package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic messy-URL fixture: `n` URL spellings over `nEntities`
 * underlying pages. Each entity has exactly one canonical URL; the
 * spellings vary every normalization the canonicalizer must undo —
 * scheme/host case, `www.`, default ports, duplicate slashes, trailing
 * slash, fragments, tracking params, and param order — while the
 * case-sensitive path core stays fixed. Pure column expressions
 * (codegen'd, reproducible at any parallelism); variant choices are
 * xxhash64-derived from (url_id, seed).
 *
 * By construction: distinct canonical forms == nEntities, and two URLs
 * share a canonical form iff they share `url_id % nEntities`.
 */
object UrlGen {

  def urls(spark: SparkSession, n: Int = 600, nEntities: Int = 150,
      seed: Long = 17L): DataFrame = {
    val id = col("id")
    def pick(salt: Int, mod: Int): Column =
      pmod(xxhash64(id, lit(seed), lit(salt)), lit(mod))

    val entity = pmod(id, lit(nEntities))
    // properties that SURVIVE canonicalization (scheme, non-default port)
    // must be entity-derived, or one entity would span several canons
    val https = pmod(entity, lit(2)) === 0
    val scheme = when(https,
        element_at(array(lit("https"), lit("HTTPS"), lit("Https")), (pick(2, 3) + 1).cast("int")))
      .otherwise(
        element_at(array(lit("http"), lit("HTTP"), lit("Http")), (pick(2, 3) + 1).cast("int")))
    val www = when(pick(3, 3) === 0, lit("www.")).otherwise(lit(""))
    val hostCore = concat(lit("shop"), pmod(entity, lit(7)), lit(".example.org"))
    val host = when(pick(4, 2) === 0, upper(hostCore)).otherwise(hostCore)
    val port = when(pmod(entity, lit(13)) === 0, lit(":8080"))
      .otherwise(when(pick(5, 3) === 0,
        when(https, lit(":443")).otherwise(lit(":80"))).otherwise(lit("")))
    val slash = when(pick(6, 3) === 0, lit("//")).otherwise(lit("/"))
    val trail = when(pick(7, 2) === 0, lit("/")).otherwise(lit(""))
    val path = concat(lit("/Cat-"), pmod(entity, lit(11)),
      slash, lit("item"), entity, trail)
    val utm = when(pick(8, 2) === 0, lit("utm_source=feed&utm_campaign=x&"))
      .otherwise(lit(""))
    val ab = when(pick(9, 2) === 0, lit("a=1&b=2")).otherwise(lit("b=2&a=1"))
    val frag = when(pick(10, 3) === 0, lit("#reviews")).otherwise(lit(""))
    val query = concat(lit("?"), utm, ab, frag)

    spark.range(n.toLong).select(
      id.as("url_id"),
      concat(scheme, lit("://"), www, host, port, path, query).as("url"))
  }
}
