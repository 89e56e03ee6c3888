package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.lens._

/** EXECUTOR-JVM-SEPARATION audit, part (a) of VERDICT r15 Next #1: every
  * entity the engine ships into Spark tasks — by closure capture or
  * broadcast — is round-tripped through the SAME serializers Spark uses
  * on a real cluster (`SparkEnv.closureSerializer` for task closures,
  * `SparkEnv.serializer` for broadcast/shuffle values) and asserted
  * BEHAVIORALLY equal after the clone, not just non-crashing.
  *
  * `local[*]` never serializes closures end-to-end (tasks run in the
  * driver JVM), so a non-serializable capture or a lazy field that
  * can't re-initialize on a fresh JVM is invisible to every other spec.
  * Parts (b)/(c) of the audit: the object-mutable-state table in
  * PLANS.md, and `tools/local_cluster_check.sh` (full Verify under two
  * real executor JVMs).
  *
  * Entities covered (the task-shipped inventory):
  *  - [[JsMapFn]] — carries only its source string; `@transient lazy`
  *    program must RE-PARSE on the clone's first map call
  *  - [[MapDsl]]-compiled specs — AST ships with a pre-compiled
  *    `java.util.regex.Pattern` (Serializable, recompiles lazily)
  *  - [[graft.ops.AhoCorasick.Automaton]] — HashMap transition tables +
  *    fail/output arrays
  *  - [[graft.ops.Ivf.Model]] / [[graft.ops.Pq.Codebooks]] — centroid
  *    matrices whose argmin tie-breaks must survive the copy bit-exactly
  *  - a scala `object` MapFn — singleton readResolve identity
  */
class SerializationAuditSpec extends AnyFunSuite {

  // SparkEnv needs a live SparkContext
  private lazy val spark = SparkTestBase.spark

  /** clone via closure serializer THEN data serializer — both wire
    * paths a real cluster exercises. */
  private def roundTrip[T: scala.reflect.ClassTag](v: T): T = {
    val _ = spark.sparkContext // force env
    val env = org.apache.spark.SparkEnv.get
    val viaClosure = {
      val s = env.closureSerializer.newInstance()
      s.deserialize[T](s.serialize(v))
    }
    val s = env.serializer.newInstance()
    s.deserialize[T](s.serialize(viaClosure))
  }

  private val path = MapPath("/datasets/a:d/records/r1", "datasets", "a", "d", "r1")

  private def results(fn: MapFn, data: PoValue): (Vector[(String, PoValue)], Option[String]) = {
    val r = MapRunner.run(fn, path, data)
    (r.outputs, r.error.map(e => s"${e.errType}:${e.message}"))
  }

  test("JsMapFn ships as source and re-parses on the clone (behavioral equality)") {
    val code =
      """const tags = data.tags || [];
        |for (const t of tags) output(t.toUpperCase(), new Set([path.recordID]));
        |output('n', tags.length)""".stripMargin
    val fn = JsMapFn.compile(code).toOption.getOrElse(fail("compile failed"))
    val data = PoObj("tags" -> PoArr(Vector(PoStr("cat"), PoStr("dog"))))
    results(fn, data) // force the ORIGINAL's lazy parse before cloning:
    // the clone must not inherit a parsed program, only the string
    val clone = roundTrip(fn)
    assert(results(clone, data) == results(fn, data))
    assert(clone.strictRejections == fn.strictRejections)
    // the lenient flag survives the wire too
    val lenient = JsMapFn.compile(code, strictRejections = false).toOption.get
    assert(!roundTrip(lenient).strictRejections)
  }

  test("MapDsl spec (incl. compiled regex Pattern) survives the wire") {
    val spec = graft.codec.JsonCodec.decode(
      """{"emit": [{"forEach": {"split": {"of": {"field": "text"}, "on": "[^a-z]+"}},
        |           "key": {"item": true},
        |           "value": {"set": [{"path": "recordID"}]}},
        |          {"key": {"lit": "upper"}, "value": {"lower": {"field": "text"}}}]}"""
        .stripMargin.getBytes("UTF-8"))
    val fn = MapDsl.compile(spec)
    val data = PoObj("text" -> PoStr("Cat and dog"))
    val clone = roundTrip(fn)
    assert(results(clone, data) == results(fn, data))
    assert(results(clone, data)._1.nonEmpty, "fixture must actually emit")
  }

  test("AhoCorasick automaton matches identically after the wire (incl. astral)") {
    val phrases = Seq("he", "she", "hers", "h😀e")
    val ac = graft.ops.AhoCorasick.build(phrases)
    val texts = Seq("ushers", "she said h😀e saw hers", "", "hhh")
    val clone = roundTrip(ac)
    texts.foreach { t =>
      assert(clone.matches(t).toList == ac.matches(t).toList, s"text: $t")
    }
    assert(clone.phrases.toSeq == ac.phrases.toSeq)
  }

  test("Ivf.Model argmin (incl. tie-breaks) is identical after the wire") {
    val model = graft.ops.Ivf.Model(Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(1.0, 0.0), Array(0.5, 0.5)))
    val clone = roundTrip(model)
    val probes = Seq(Seq(0.9, 0.1), Seq(1.0, 0.0), Seq(0.5, 0.5), Seq(-3.0, 4.0))
    probes.foreach { v =>
      assert(clone.nearestCell(v) == model.nearestCell(v))
      assert(clone.nearestCells(v, 3) == model.nearestCells(v, 3))
    }
    // the duplicate centroid pair (cells 1/2) pins the lowest-index tie-break
    assert(clone.nearestCell(Seq(1.0, 0.0)) == 1)
  }

  test("Pq.Codebooks encode identically after the wire") {
    val cb = graft.ops.Pq.Codebooks(2, Vector(
      graft.ops.Ivf.Model(Array(Array(0.0, 0.0), Array(1.0, 1.0))),
      graft.ops.Ivf.Model(Array(Array(2.0, 2.0), Array(3.0, 3.0)))))
    val clone = roundTrip(cb)
    val probes = Seq(Seq(0.1, 0.2, 2.9, 2.8), Seq(1.0, 1.0, 2.0, 2.0))
    probes.foreach(v => assert(clone.encodeVec(v).toSeq == cb.encodeVec(v).toSeq))
  }

  test("scala-object MapFns resolve back to their singleton (readResolve identity)") {
    val fn: MapFn = graft.queries.LensTokenIndex.TokenFn
    assert(roundTrip(fn) eq fn,
      "object MapFn must deserialize to the same singleton — object-level " +
        "state would otherwise fork per executor")
  }
}
