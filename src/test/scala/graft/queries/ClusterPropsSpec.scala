package graft.queries

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property contract for connectedComponents: against a brute-force
  * union-find oracle on random graphs — same components, same min-id
  * representatives, regardless of edge order or partitioning.
  */
object ClusterPropsSpec extends Properties("ConnectedComponents") {

  private lazy val spark = TestSpark.spark

  // keep the Spark-loop sample count modest: each case runs an iterative job
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.groupBy(find).flatMap { case (_, members) =>
      val rep = members.min
      members.map(_ -> rep)
    }
  }

  private val gen = for {
    nNodes <- Gen.choose(2, 25)
    nEdges <- Gen.choose(1, 40)
    edges <- Gen.listOfN(nEdges,
      Gen.zip(Gen.choose(0L, nNodes.toLong), Gen.choose(0L, nNodes.toLong)))
  } yield edges.filter(e => e._1 != e._2)
    .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct

  property("equals union-find on random graphs") = forAll(gen) { edges =>
    import spark.implicits._
    edges.isEmpty || {
      val got = Extensions.connectedComponents(edges.toDF("a_id", "b_id"))
        .select("doc_id", "cluster_rep").as[(Long, Long)].collect().toMap
      got == unionFind(edges)
    }
  }
}
