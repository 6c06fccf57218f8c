package graft.core

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private def ctx = PipelineContext("t")

  test("processors run in order and log execution") {
    val p1 = Processor("A")(c => c.withResult("a", 1))
    val p2 = Processor("B")(c => c.withResult("b", c.result[Int]("a") + 1))
    val out = new Pipeline(Seq(p1, p2)).run(ctx)
    assert(out.result[Int]("b") == 2)
    assert(out.executionLog.map(_.processor) == Vector("A", "B"))
    assert(out.executionLog.forall(!_.skipped))
  }

  test("conditions skip steps and skipped steps are logged") {
    val p1 = Processor("A")(c => c.withResult("a", 1))
    val p2 = Processor("B")(c => c.withResult("b", 2))
    val out = new Pipeline(Seq(p1, p2), conditions = Map("B" -> (_ => false))).run(ctx)
    assert(out.resultOpt[Int]("b").isEmpty)
    assert(out.executionLog.find(_.processor == "B").exists(_.skipped))
  }

  test("stopOnError=true fails fast with context attached") {
    val bad = Processor("Boom")(_ => throw new RuntimeException("nope"))
    val e = intercept[PipelineStepException](new Pipeline(Seq(bad)).run(ctx))
    assert(e.step == "Boom")
    assert(e.context.errors.exists(_.processor == "Boom"))
  }

  test("stopOnError=false records the error and continues") {
    val bad = Processor("Boom")(_ => throw new RuntimeException("nope"))
    val after = Processor("After")(c => c.withResult("done", true))
    val out = new Pipeline(Seq(bad, after), stopOnError = false).run(ctx)
    assert(out.result[Boolean]("done"))
    assert(out.errors.exists(_.processor == "Boom"))
    assert(out.warnings.nonEmpty)
  }

  test("validatePrerequisites rejects missing tables/columns") {
    val needs = new Processor {
      override def requiredTables = Seq("events")
      override def requiredColumns = Map("events" -> Seq("no_such_col"))
      override def process(c: PipelineContext) = c
    }
    intercept[IllegalStateException](needs(ctx)) // missing table
    import sqlImplicits._
    val withTable = ctx.withTable("events", Seq((1, "a")).toDF("id", "v"))
    val err = intercept[IllegalStateException](needs(withTable))
    assert(err.getMessage.contains("no_such_col"))
  }

  test("a FAILED step records no checkpoint (resume must re-run it, not skip its work)") {
    val good = Processor("Good")(c => c.withResult("g", 1))
    val bad = Processor("Boom")(_ => throw new RuntimeException("nope"))
    val pipe = new Pipeline(Seq(good, bad), stopOnError = false, enableCheckpoints = true)
    pipe.run(ctx)
    assert(pipe.checkpoints.contains("Good"))
    assert(!pipe.checkpoints.contains("Boom"),
      "a checkpoint under the failed step's name would make runPartial resume skip it")
  }

  test("requiredResults gates a step with a named error, not a bare key-not-found") {
    val consumer = Processor("Needs", requiredRes = Seq("variance_raw"))(c =>
      c.withResult("out", c.result[Int]("variance_raw") + 1))
    val e = intercept[IllegalStateException](consumer(ctx))
    assert(e.getMessage.contains("required result 'variance_raw'"), e.getMessage)
    assert(consumer(ctx.withResult("variance_raw", 1)).result[Int]("out") == 2)
  }

  test("runPartial slices inclusively by name") {
    val ps = Seq("A", "B", "C").map(n => Processor(n)(c => c.withResult(n, 1)))
    val out = new Pipeline(ps).runPartial(ctx, "B", "C")
    assert(out.resultOpt[Int]("A").isEmpty && out.resultOpt[Int]("B").nonEmpty && out.resultOpt[Int]("C").nonEmpty)
  }
}
