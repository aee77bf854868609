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
    assert(f.getAs[Long]("neardup") === 2L)        // good+" extra" ≈ good: out
    assert(f.getAs[Long]("decontaminated") === 1L) // held-out doc out
    val kept = r.corpus.select("doc_id").as[Long].collect().toSet
    // 2 fell at exact dedup, 4 at near-dup collapse (its text is `good`
    // plus one word — a true near-duplicate, minhash bands collide), 5
    // at decontamination; the keeper of each dup family is the min id
    assert(kept === Set(1L))
    // fold column present and valued
    val splits = r.corpus.select("split").as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("flood e2e: a 300-doc boilerplate flood is caught by the funnel with recall ~1.0") {
    // the same adversarial corpus LshRecallSpec feeds q20: 300 docs of
    // shared 60-token boilerplate + one unique token each (pairwise
    // J ≈ 0.97, NOT exact duplicates). q20's contract there is to drop
    // the flooded bucket WHOLE — zero reported pairs, recall 0 on the
    // flood by policy, with the funnel named as the owner of the class.
    // This case PROVES that composition: the near-dup collapse stage is
    // a bucket-min aggregate with no cap, so the flood drains to its
    // min-id keeper end-to-end.
    val boiler = (0 until 60).map(i => s"fb$i")
    val flood = (0 until 300).map { d =>
      (100000L + d, (boiler :+ s"fu$d").mkString(" "))
    }
    // distinct healthy docs — must NOT be dragged down by the flood
    val normal = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then the fox " +
        "is seen by the dog near the river where the animals often meet"),
      (2L, "completely different article about the weather today with the " +
        "sun and the clouds and the wind that blows over the hills again"))
    val docs = (flood ++ normal).toDF("doc_id", "text")
    val r = Curation.curate(docs)
    val kept = r.corpus.select("doc_id").as[Long].collect().toSet
    val floodKept = kept.filter(_ >= 100000L)
    val recall = (300 - floodKept.size).toDouble / 299.0
    assert(recall >= 0.99,
      s"funnel flood recall $recall: ${floodKept.size} flood docs survived " +
        s"(want ~1): ${floodKept.take(5).mkString(", ")}")
    assert(floodKept.contains(100000L), "the flood keeper is the min doc_id")
    assert(kept.contains(1L) && kept.contains(2L),
      "distinct docs survive — the flood is contained, not contagious")
    // the funnel's stage accounting shows WHERE the flood fell: quality
    // passes all (clean tokens), exact dedup passes all (unique texts),
    // near-dup collapse is the owner
    val f = r.funnel.head()
    assert(f.getAs[Long]("raw") === 302L)
    assert(f.getAs[Long]("quality") === 302L)
    assert(f.getAs[Long]("dedup") === 302L)
    assert(f.getAs[Long]("neardup") === (2L + floodKept.size))
  }

  test("a keeper that fails an earlier gate cannot annihilate its near-dup family") {
    // doc 10 is the min-id member of the near-dup family but FAILS the
    // quality gate (>1000 tokens — outside the length band, and the
    // stopword+punct terms alone stay under 0.5). Keeper choice over the
    // RAW corpus would elect 10, drop 11/12 via neardup_ok=false, and
    // then drop 10 itself at q_ok — the family vanishes though passing
    // members existed. Keeper choice over the preceding gates' survivors
    // elects 11, and exactly one representative reaches the corpus.
    val docs = Seq(
      (10L, (good + " ") * 50),
      (11L, good + " extraone"),
      (12L, good + " extratwo")
    ).toDF("doc_id", "text")
    val r = Curation.curate(docs)
    val kept = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L),
      s"want the min PASSING doc as the family's sole representative, got $kept")
    val f = r.funnel.head()
    assert(f.getAs[Long]("quality") === 2L, "doc 10 must fail the quality gate")
    assert(f.getAs[Long]("neardup") === 1L)
  }

  test("containment collapse: a short doc quoted whole inside a long one is dropped") {
    // The adversarial subsumption case symmetric near-dup MISSES by
    // construction: doc 1 (27 tokens) is quoted verbatim inside doc 2
    // (~75 tokens), so their shingle Jaccard is ≈ |W1|/|W2| ≪ the band
    // collision threshold — but every sliding 8-token window of doc 1
    // appears in doc 2, so containment(1→2) = 1.0.
    val long1 = "completely different article about the weather today with " +
      "the sun and the clouds and the wind that blows over the hills again " +
      good + " and after the meeting the animals return while the sun sets " +
      "slowly behind the green hills and the river keeps flowing to the sea"
    val docs = Seq(
      (1L, good),  // quoted whole inside 2 → contained, dropped when ON
      (2L, long1), // the quoting doc — always kept
      (3L, "completely unrelated piece about the ocean and the ships that " +
        "sail across the waves while the wind is strong and the sailors " +
        "are brave near the shore")
    ).toDF("doc_id", "text")
    // stage off (default): the quotation is invisible to every symmetric
    // stage, and the funnel's contained column degenerates to neardup
    val off = Curation.curate(docs)
    assert(off.corpus.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    val offF = off.funnel.head()
    assert(offF.getAs[Long]("contained") === offF.getAs[Long]("neardup"))
    // stage on: the contained (fewer-windows) side drops; the quoting doc
    // keeps the shared text, the unrelated doc is untouched (precision:
    // no pair without >= ContainMinShared shared rare windows exists)
    val on = Curation.curate(docs, containment = Some(0.9))
    assert(on.corpus.select("doc_id").as[Long].collect().toSet === Set(2L, 3L))
    val f = on.funnel.head()
    assert(f.getAs[Long]("raw") === 3L)
    assert(f.getAs[Long]("neardup") === 3L,
      "near-dup must NOT catch the quotation — this stage owns it")
    assert(f.getAs[Long]("contained") === 2L)
    assert(f.getAs[Long]("decontaminated") === 2L)
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
