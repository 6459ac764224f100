package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Hashed-linear classifier inference ([[TextAnalysis.scoreHashedLinear]]):
  * brute-force parity with a plain-Scala replay of the md5 bucket hash,
  * plus the plumbing shapes — multiplicity counting, missing buckets
  * weighing 0, bias/threshold, and NULL text. */
class HashedLinearSpec extends SparkSpec {
  import spark.implicits._

  /** Scala twin of TextOps.xhash: md5 → first 15 hex digits → Long. */
  private def xhash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val dim = 64

  /** The gate's arithmetic model: w(bucket) = bucket % 17 - 8. */
  private def weightsDf = spark.range(dim).select(col("id").as("bucket"),
    ((col("id") % 17) - 8).cast("long").as("w_permille"))

  private def run(corpus: Seq[(Long, String)], bias: Long = 0L,
                  thr: Long = 0L): Map[Long, (Long, Long, Long)] =
    TextAnalysis.scoreHashedLinear(corpus.toDF("doc_id", "text"), weightsDf,
        dim, bias, thr)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def brute(corpus: Seq[(Long, String)], bias: Long = 0L,
                    thr: Long = 0L): Map[Long, (Long, Long, Long)] =
    corpus.map { case (id, t) =>
      val ws = Option(t).getOrElse("").split(" ", -1)
      val logit = bias + ws.map(w => (xhash(w) % dim) % 17 - 8).sum
      id -> ((ws.length.toLong, logit, if (logit >= thr) 1L else 0L))
    }.toMap

  test("brute-force parity on a randomized corpus (multiplicity counts)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("agg", "scan", "sort", "join", "key", "row", "col",
      "tbl", "x1", "y2", "z3")
    val corpus = (0L until 80L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(run(corpus) === brute(corpus))
  }

  test("bias shifts the logit; threshold moves the keep boundary") {
    val corpus = Seq(1L -> "agg agg scan")
    val base = brute(corpus)(1L)._2
    assert(run(corpus, bias = 5L)(1L)._2 === base + 5L)
    assert(run(corpus, thr = base + 1L)(1L)._3 === 0L)
    assert(run(corpus, thr = base)(1L)._3 === 1L)
  }

  test("buckets absent from the weights table weigh 0") {
    // weights covering only bucket b("agg"): the other tokens contribute 0
    val bAgg = xhash("agg") % dim
    val w = Seq((bAgg, 100L)).toDF("bucket", "w_permille")
    val out = TextAnalysis.scoreHashedLinear(
        Seq(1L -> "agg other tokens here").toDF("doc_id", "text"), w, dim)
      .collect().head
    assert(out.getLong(1) === 4L)    // n_tokens
    assert(out.getLong(2) === 100L)  // only agg's bucket scores
  }

  test("NULL text is one empty token; empty weights leave logit = bias") {
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "w_permille")
    val out = TextAnalysis.scoreHashedLinear(
        Seq(1L -> null.asInstanceOf[String]).toDF("doc_id", "text"),
        empty, dim, biasPermille = 7L)
      .collect().head
    assert(out.getLong(1) === 1L)
    assert(out.getLong(2) === 7L)
    assert(out.getLong(3) === 1L)
  }
}
