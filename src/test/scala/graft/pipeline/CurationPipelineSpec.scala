package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Composition contract: the funnel counts each stage's survivors, the
  * corpus is exactly the all-gates survivors with deterministic keepers
  * and folds, and the whole thing is rerun-stable.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 20-to-1000-token band + stopwords => passes the quality gate
  private val good =
    "the quick brown fox jumps over the lazy dog and then the fox " +
      "is seen by the dog near the river where the animals often meet"
  private val junky = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"

  test("funnel counts and final corpus match the stage semantics") {
    val docs = Seq(
      (1L, good),            // survives everything
      (2L, good),            // exact dup of 1 → dropped at dedup
      (3L, junky),           // fails quality
      (4L, good + " extra"), // unique, good
      (5L, "held out text is exactly this sentence and it is long enough " +
        "to pass the quality gate with the usual stopwords in it today"),
      (6L, "   ") // zero tokens → quality 0.0 via the totalizing guard;
                  // the raw formula would throw DIVIDE_BY_ZERO under ANSI
    ).toDF("doc_id", "text")
    val held = Seq(
      ("held out text is exactly this sentence and it is long enough " +
        "to pass the quality gate with the usual stopwords in it today"))
      .toDF("text")
    val r = Curation.curate(docs, Some(held))
    val f = r.funnel.head()
    assert(f.getAs[Long]("raw") === 6L)
    assert(f.getAs[Long]("quality") === 4L)        // junky + NaN-scored out
    assert(f.getAs[Long]("dedup") === 3L)          // dup of 1 out
    assert(f.getAs[Long]("decontaminated") === 2L) // held-out doc out
    val kept = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L)) // keeper of the dup pair is the min id
    // fold column present and valued
    val splits = r.corpus.select("split").as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("rerun-stable: two runs produce identical corpora") {
    val docs = (1L to 300L).map(i =>
      (i, s"document number $i with the usual words and the stopwords " +
        s"that are needed to pass the gate " + ("filler " * (i % 30).toInt)))
      .toDF("doc_id", "text")
    val a = Curation.curate(docs).corpus
      .select("doc_id", "digest", "split").collect().toSet
    val b = Curation.curate(docs.repartition(7)).corpus
      .select("doc_id", "digest", "split").collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
