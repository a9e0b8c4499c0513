package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the tail of Bench's output (observed
  * window: 2000 chars, partly consumed by sbt's `[success]` line), so
  * the stdout JSON line must stay under Bench.StdoutBudget no matter
  * how large the inventory grows — rounds 1-3 all shipped an
  * unparseable BENCH_r{N}.json because the full query map overflowed
  * the window. The full map goes to the durable file instead. */
class BenchRenderSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def fake(n: Int): Seq[(String, Double, Option[String])] =
    (0 until n).map(i => (f"some_quite_long_query_name_$i%03d", i * 0.137 + 0.2, None))

  test("stdout line fits the driver tail window even at 300 queries") {
    for (n <- Seq(1, 50, 113, 300)) {
      val (line, _) = Bench.render(fake(n), "/root/testdata/sf0.1", "/root/repo/BENCH_FULL.json")
      assert(line.length <= Bench.StdoutBudget, s"n=$n line=${line.length}")
      assert(!line.contains('\n'))
    }
  }

  test("stdout line is valid JSON carrying total/value/unit and the slowest queries") {
    val rs = fake(200)
    val (line, full) = Bench.render(rs, "/sf", "/root/repo/BENCH_FULL.json")
    val j = mapper.readTree(line)
    assert(j.get("metric").asText() == "total")
    assert(j.get("unit").asText() == "sec")
    assert(math.abs(j.get("value").asDouble() - rs.map(_._2).sum) < 1e-6)
    assert(j.get("n_queries").asInt() == 200)
    val kept = j.get("queries")
    assert(kept.size() + j.get("queries_omitted").asInt() == 200)
    // greedy slowest-first: everything kept must be >= everything omitted
    val keptNames = kept.fieldNames()
    var minKept = Double.MaxValue
    while (keptNames.hasNext) {
      val n = keptNames.next(); minKept = math.min(minKept, kept.get(n).asDouble())
    }
    val omitted = rs.filterNot(r => kept.has(r._1))
    assert(omitted.forall(_._2 <= minKept + 1e-9))
    // full file carries every query
    val fj = mapper.readTree(full)
    assert(fj.get("queries").size() == 200)
    assert(fj.get("queries_omitted").asInt() == 0)
  }

  test("errors always survive into the stdout line") {
    val rs = fake(200) :+ (("exploding_query", 0.01, Some("java.lang.RuntimeException: boom \"x\"")))
    val (line, _) = Bench.render(rs, "/sf", "/f")
    val j = mapper.readTree(line)
    assert(j.get("n_err").asInt() == 1)
    assert(j.get("errors").get("exploding_query").asText().contains("boom"))
    assert(line.length <= Bench.StdoutBudget)
  }
}
