package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared BPE machinery for the unrolled trainer query (q110) and the
  * persisted [[graft.pipeline.TokenizerStore]].
  *
  * The corpus rides as ONE string per document in double-space encoding
  * (`" a  b  c "`): a pair match `" a  b "` always consumes one space of
  * each neighbor gap and reinserts it, so plain non-regex `replace` is
  * boundary-safe across every merge — no lookaround (which RE2 lacks),
  * no regex at all, and the same expression runs verbatim in the DuckDB
  * oracle.
  */
object Bpe {

  /** Double-space encoding of a document's subword stream. */
  def corpusString(text: Column): Column =
    concat(lit(" "), array_join(TextOps.subwordTokens(text), "  "), lit(" "))

  /** Tokens of a double-space-encoded stream. */
  def streamTokens(s: Column): Column = split(trim(s), "  ")

  /** The training argmax: most frequent adjacent pair of `cur`'s `s`
    * column as a GUARANTEED 1-row frame (`m` = "a b"; freq DESC, pair —
    * an exact total order). Callers broadcast it straight back into the
    * merge map (q110 — the argmax never leaves the cluster) or collect
    * the single row to persist it (TokenizerStore). Merged units contain
    * no space, so `contains(" ")` keeps exactly the ADJACENT-pair
    * shingles.
    *
    * A corpus with NO adjacent pair left (every doc a single subword)
    * yields the sentinel `m = ""` — freq −1, so it can never beat a real
    * pair — for which [[applyMerge]] is the identity. Without it the
    * empty argmax frame would cross-join every document away instead of
    * passing the corpus through unmerged. */
  def bestPair(cur: DataFrame): DataFrame =
    cur.select(explode(TextOps.shingles(streamTokens(col("s")), 2)).as("pair"))
      .filter(col("pair").contains(" "))
      .groupBy("pair").agg(count(lit(1)).as("freq"))
      .unionByName(cur.sparkSession.range(1)
        .select(lit("").as("pair"), lit(-1L).as("freq")))
      .orderBy(col("freq").desc, col("pair"))
      .limit(1)
      .select(col("pair").as("m"))

  /** One merge applied to a double-space-encoded stream: `" a  b "` →
    * `" ab "`, every occurrence, boundary-safe by the encoding. */
  def applyMerge(s: Column, pair: Column): Column =
    replace(s,
      concat(lit(" "), replace(pair, lit(" "), lit("  ")), lit(" ")),
      concat(lit(" "), replace(pair, lit(" "), lit("")), lit(" ")))
}
