package graft

import org.apache.spark.sql.functions._

/** The r15 bucket-size guard on the UNCAPPED self-join paths (q35/q38):
  * result-neutral below the cap (byte-identical rows), a loud named
  * failure above it — the 100 TB degenerate-bucket scenario must
  * diagnose itself instead of straggling or OOMing anonymously.
  */
class SkewGuardSpec extends SparkSuite {

  private def rel = {
    import spark.implicits._
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 30L))
      .toDF("id", "bucket")
  }

  test("below the cap the guard is result-neutral (identical rows, same schema)") {
    val guarded = graft.operators.SkewGuard
      .boundedBuckets(rel, Seq("bucket"), cap = 3L, what = "spec")
    assert(guarded.schema == rel.schema)
    assert(guarded.orderBy("id").collect().toSeq ==
      rel.orderBy("id").collect().toSeq)
  }

  test("a bucket past the cap fails loudly, naming the operator, cap and size") {
    val guarded = graft.operators.SkewGuard
      .boundedBuckets(rel, Seq("bucket"), cap = 2L, what = "q-spec-guard")
    val e = intercept[Throwable] {
      guarded.write.format("noop").mode("overwrite").save()
    }
    // Spark wraps the codegen'd assert failure; the message must surface
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("q-spec-guard"))
    assert(msg.contains("cap 2"))
    assert(msg.contains("holds 3"))
  }

  test("q35/q38 still answer at test scale with the guard attached (no trip)") {
    // the declared queries carry the guard in-line; a tiny corpus must
    // pass through it untouched
    val docs = {
      import spark.implicits._
      Seq((1L, "s1", "alpha beta gamma"), (2L, "s1", "alpha beta gamma"),
        (3L, "s2", "delta epsilon")).toDF("doc_id", "source", "text")
    }
    val sig = graft.queries.DedupQueries.simhash32(docs)
    assert(sig.count() == 3)
  }
}
