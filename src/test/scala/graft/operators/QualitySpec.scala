package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q113–q118 data-quality/governance operators on hand-computed
  * fixtures. */
class QualitySpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("q113: profiler counts rows, nulls, ndv, min/max per column") {
    import s.implicits._
    val dir = tmp("q113")
    Seq(
      (10L, 1.0, "A", ts(1), 0.05),
      (10L, 2.0, "A", ts(2), 0.05),
      (20L, 2.0, "R", ts(2), 0.10))
      .toDF("l_partkey", "l_quantity", "l_returnflag", "l_shipdate",
        "l_discount")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    val rows = Quality.q113Profile(s, dir.toString).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(rows.map(_._1) === Seq("l_discount_cents", "l_partkey",
      "l_qty_cents", "l_returnflag", "l_shipdate_epoch"))
    val byName = rows.map(r => r._1 -> r).toMap
    def pad(v: String): String = ("0" * (20 - v.length)) + v
    // numeric canonical strings are zero-padded to width 20, so the
    // single string-typed min/max column orders NUMERICALLY — the
    // unpadded form reported min="10", max="5" for l_discount_cents
    // (well-defined, but misleading for a profiler; ADVICE r9)
    assert(byName("l_partkey") ===
      (("l_partkey", 3L, 0L, 2L, pad("10"), pad("20"))))
    assert(byName("l_qty_cents") ===
      (("l_qty_cents", 3L, 0L, 2L, pad("100"), pad("200"))))
    assert(byName("l_returnflag") ===
      (("l_returnflag", 3L, 0L, 2L, "A", "R")))
    assert(byName("l_discount_cents") ===
      (("l_discount_cents", 3L, 0L, 2L, pad("5"), pad("10"))))
    // epoch strings: 2024-01-01 = 1704067200, 2024-01-02 = 1704153600
    assert(byName("l_shipdate_epoch") ===
      (("l_shipdate_epoch", 3L, 0L, 2L,
        pad("1704067200"), pad("1704153600"))))
  }

  test("q114: pair support, confidence, lift on a planted basket set") {
    import s.implicits._
    val dir = tmp("q114")
    // 20 baskets {brandA, brandB}, 5 baskets {brandC} → only (A,B)
    // clears min support 20. lift = 20·25·1e6 div (20·20) = 1,250,000.
    val li = (1L to 20L).flatMap(b => Seq((b, 1L), (b, 2L))) ++
      (21L to 25L).map(b => (b, 3L))
    li.toDF("l_orderkey", "l_partkey")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    Seq((1L, "brandA"), (2L, "brandB"), (3L, "brandC"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(dir.resolve("part.parquet").toString)
    val rows = Quality.q114BasketLift(s, dir.toString).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(rows === Seq(
      ("brandA", "brandB", 20L, 20L, 20L, 25L, 1000000L, 1250000L)))
  }

  test("q115: Benford digits, ppm shares, exact expectation constants") {
    import s.implicits._
    val dir = tmp("q115")
    // 30 orders at $1.00 (digit 1), 10 at $2.50 (2), 10 at $9.99 (9)
    val prices = Seq.fill(30)(1.00) ++ Seq.fill(10)(2.50) ++
      Seq.fill(10)(9.99)
    prices.toDF("o_totalprice")
      .write.parquet(dir.resolve("orders.parquet").toString)
    val rows = Quality.q115Benford(s, dir.toString).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows === Seq(
      (1L, 30L, 50L, 600000L, 301030L, 298970L),
      (2L, 10L, 50L, 200000L, 176091L, 23909L),
      (9L, 10L, 50L, 200000L, 45757L, 154243L)))
  }

  test("q116: per-user lag transitions and conditional ppm") {
    import s.implicits._
    val dir = tmp("q116")
    // user 1: A(t1) B(t2) A(t3); user 2: A(t1) B(t2)
    // → A→B ×2 (of 2 departures from A), B→A ×1 (of 1 from B)
    Seq(
      (1L, 1L, 1L, "A"), (2L, 2L, 1L, "B"), (3L, 3L, 1L, "A"),
      (4L, 1L, 2L, "A"), (5L, 2L, 2L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Quality.q116MarkovTransitions(s, dir.toString).collect()
      .toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows === Seq(
      ("A", "B", 2L, 2L, 1000000L),
      ("B", "A", 1L, 1L, 1000000L)))
  }

  test("q117: orphan FKs and duplicate PKs are counted per check") {
    import s.implicits._
    val dir = tmp("q117")
    // lineitem: order 99 is an orphan; part 7 exists, part 8 doesn't.
    Seq((1L, 7L), (99L, 8L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    // orders: duplicate pk 1; customer 5 exists, 6 doesn't.
    Seq((1L, 5L), (1L, 5L), (2L, 6L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(dir.resolve("orders.parquet").toString)
    Seq((5L, "x"), (5L, "y"))
      .toDF("c_custkey", "c_name")
      .write.parquet(dir.resolve("customer.parquet").toString)
    Seq(Tuple1(7L)).toDF("p_partkey")
      .write.parquet(dir.resolve("part.parquet").toString)
    Seq((1L, 1L, 5L, "A"), (2L, 2L, 44L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Quality.q117RefIntegrity(s, dir.toString).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows === Seq(
      ("customer_pk_unique", 2L, 1L),
      ("events_fk_user", 2L, 1L),
      ("lineitem_fk_orderkey", 2L, 1L),
      ("lineitem_fk_partkey", 2L, 1L),
      ("orders_fk_custkey", 3L, 1L),
      ("orders_pk_unique", 3L, 1L)))
  }

  test("q118: deletion cascades through orders to lineitem and events") {
    import s.implicits._
    val dir = tmp("q118")
    Seq((0L, "a"), (97L, "b"), (5L, "c"))
      .toDF("c_custkey", "c_name")
      .write.parquet(dir.resolve("customer.parquet").toString)
    Seq((1L, 0L), (2L, 5L), (3L, 97L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(dir.resolve("orders.parquet").toString)
    Seq(Tuple1(1L), Tuple1(1L), Tuple1(2L)).toDF("l_orderkey")
      .write.parquet(dir.resolve("lineitem.parquet").toString)
    Seq((1L, 1L, 0L, "A"), (2L, 2L, 5L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Quality.q118RtbfCascade(s, dir.toString).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows === Seq(
      ("customer", 3L, 2L, 666666L),
      ("events", 2L, 1L, 500000L),
      ("lineitem", 3L, 2L, 666666L),
      ("orders", 3L, 2L, 666666L)))
  }
}
