package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation-based per-key top-k (SURVEY.md §7.3's custom-aggregate
  * surface: `Aggregator[IN, BUF, OUT]` registered as a typed column).
  *
  * Scale rationale vs the window-function formulation
  * (`row_number().over(partitionBy(key).orderBy(...))`): a window sorts
  * every row of every partition key — a full shuffle + sort of the input.
  * An Aggregator keeps only k rows per key in its buffer, combines
  * map-side (partial aggregation), and ships at most k rows per key per
  * partition across the shuffle: at 100 TB, k·|keys| versus |rows|. */
object TopK {

  final case class Entry(ord: Double, tiebreak: Long, payload: Long)

  /** Bounded buffer (a Product so Encoders.product applies). */
  final case class Buf(entries: Seq[Entry])

  /** Keep the k largest entries by (ord desc, tiebreak asc); the input is
    * the (key, entry) pair shape groupByKey feeds the aggregator. */
  final class TopKAgg(k: Int) extends Aggregator[(Long, Entry), Buf, Buf] {
    private val ordering: Ordering[Entry] =
      Ordering.by((e: Entry) => (-e.ord, e.tiebreak))
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, a: (Long, Entry)): Buf =
      Buf((b.entries :+ a._2).sorted(ordering).take(k))
    override def merge(x: Buf, y: Buf): Buf =
      Buf((x.entries ++ y.entries).sorted(ordering).take(k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder = Encoders.product[Buf]
    override def outputEncoder = Encoders.product[Buf]
  }

  final case class SEntry(ord: Double, payload: String)

  final case class SBuf(entries: Seq[SEntry])

  /** String-payload twin of [[TopKAgg]]: k largest by (ord desc,
    * payload asc) — the payload doubles as the deterministic tiebreak. */
  final class TopKAggStr(k: Int) extends Aggregator[(String, SEntry), SBuf, SBuf] {
    private val ordering: Ordering[SEntry] =
      Ordering.by((e: SEntry) => (-e.ord, e.payload))
    override def zero: SBuf = SBuf(Vector.empty)
    override def reduce(b: SBuf, a: (String, SEntry)): SBuf =
      SBuf((b.entries :+ a._2).sorted(ordering).take(k))
    override def merge(x: SBuf, y: SBuf): SBuf =
      SBuf((x.entries ++ y.entries).sorted(ordering).take(k))
    override def finish(r: SBuf): SBuf = r
    override def bufferEncoder = Encoders.product[SBuf]
    override def outputEncoder = Encoders.product[SBuf]
  }

  /** Top-k rows per STRING key with STRING payloads (e.g. top n-grams
    * per language): (key, payload, ord, rn), ordered (ord desc, payload
    * asc). Same bounded-buffer scale contract as [[perKey]]. */
  def perKeyStr(df: DataFrame, key: String, ord: String, payload: String,
                k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(key).cast("string").as("k"),
        col(ord).cast("double").as("ord"),
        col(payload).cast("string").as("payload"))
      .as[(String, Double, String)]
      .map { case (kk, o, p) => (kk, SEntry(o, p)) }
    val agg = new TopKAggStr(k)
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (kk, top) =>
        top.entries.zipWithIndex.map { case (e, i) =>
          (kk, e.payload, e.ord, i + 1L)
        }
      }
      .toDF(key, payload, ord, "rn")
  }

  /** Top-k rows per key: input columns (key, ord double, tiebreak long,
    * payload long) → (key, payload, ord, rn). Semantics identical to the
    * row_number window formulation with ordering (ord desc, tiebreak). */
  def perKey(df: DataFrame, key: String, ord: String, tiebreak: String,
             payload: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(key).cast("long").as("k"),
        col(ord).cast("double").as("ord"),
        col(tiebreak).cast("long").as("tiebreak"),
        col(payload).cast("long").as("payload"))
      .as[(Long, Double, Long, Long)]
      .map { case (kk, o, t, p) => (kk, Entry(o, t, p)) }
    val agg = new TopKAgg(k)
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (kk, top) =>
        top.entries.zipWithIndex.map { case (e, i) =>
          (kk, e.payload, e.ord, i + 1L)
        }
      }
      .toDF(key, payload, ord, "rn")
  }
}
