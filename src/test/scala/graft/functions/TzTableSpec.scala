package graft.functions

import graft.expr.TzTable
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, LocalDateTime, ZoneId, ZoneOffset, ZonedDateTime}

/** Cross-implementation lock: [[TzTable]]'s baked transition table and
  * two-probe local→instant resolution must agree with java.time's OWN
  * answers (`ZoneRules.getOffset`, `ZonedDateTime.ofLocal`) on every
  * instant/local-time class — the table is DERIVED from java.time, so
  * any disagreement is a bake or lookup bug, not a rules question.
  * `ZonedDateTime.ofLocal(ldt, zone, pref)` is the exact spec of the
  * engine's resolution: gap → shift forward by the gap, overlap →
  * `pref` when valid else the earlier offset. */
class TzTableSpec extends AnyFunSuite {

  private val zones =
    Seq("America/New_York", "Europe/Berlin", "Asia/Kolkata",
      "Australia/Sydney", "America/Sao_Paulo")

  test("offsetAt == ZoneRules.getOffset across a century sweep, " +
      "including the seconds AROUND every baked transition") {
    for (z <- zones) {
      val tbl = TzTable.of(z)
      val rules = ZoneId.of(z).getRules
      // coarse sweep: every ~37 days, 1950..2199 (the r18 horizon)
      var t = -631152000L // 1950-01-01
      val hi = 7258118400L - 86400 // just under 2200-01-01
      while (t < hi) {
        assert(tbl.offsetAt(t) ==
          rules.getOffset(Instant.ofEpochSecond(t)).getTotalSeconds,
          s"$z at $t")
        t += 3200000L
      }
      // sharp sweep: ±2s around every baked transition
      tbl.trans.drop(1).foreach { tr =>
        for (d <- Seq(-2L, -1L, 0L, 1L, 2L)) {
          val x = tr + d
          if (x < tbl.horizon)
            assert(tbl.offsetAt(x) ==
              rules.getOffset(Instant.ofEpochSecond(x)).getTotalSeconds,
              s"$z around transition $tr d=$d")
        }
      }
    }
  }

  test("localToInstant == ZonedDateTime.ofLocal for plain, gap and " +
      "overlap local times, with and without an offset preference") {
    for (z <- zones) {
      val tbl = TzTable.of(z)
      val zid = ZoneId.of(z)
      val rules = zid.getRules
      def check(local: Long, prefSecs: Long): Unit = {
        val ldt = LocalDateTime.ofEpochSecond(local, 0, ZoneOffset.UTC)
        val pref =
          if (prefSecs == Long.MinValue) null
          else ZoneOffset.ofTotalSeconds(prefSecs.toInt)
        val want = ZonedDateTime.ofLocal(ldt, zid, pref).toEpochSecond
        assert(tbl.localToInstant(local, prefSecs) == want,
          s"$z local=$local pref=$prefSecs")
      }
      // minute-by-minute locals across a ±3h window around a SAMPLE
      // of baked transitions — every 13th plus first/last — (covers
      // gap interiors, overlap interiors, and both edges), each with
      // no pref and with both offsets as pref. The full per-minute
      // sweep over every transition of five zones is ~2M ofLocal
      // calls; the sample keeps the lock sharp at test speed.
      val eligible = tbl.trans.drop(1)
        .filter(t => t > 0 && t + 86400 < tbl.horizon)
      eligible.zipWithIndex.collect {
          case (t, i) if i % 13 == 0 || i == eligible.length - 1 => t }
        .foreach { tr =>
          val i = tbl.trans.indexOf(tr)
          val before = tbl.offs(i - 1)
          val after = tbl.offs(i)
          var l = tr + math.min(before, after) - 3 * 3600
          val end = tr + math.max(before, after) + 3 * 3600
          while (l <= end) {
            check(l, Long.MinValue)
            check(l, before)
            check(l, after)
            l += 60
          }
        }
      // plain locals far from any transition
      Seq(0L, 1672531200L, 1689415200L, 3000000000L).foreach { l =>
        check(l, Long.MinValue)
        check(l, rules.getOffset(Instant.ofEpochSecond(l))
          .getTotalSeconds.toLong)
      }
    }
  }

  test("horizon is loud on both lookups; unknown zones raise at bake") {
    val tbl = TzTable.of("America/New_York")
    val past = intercept[IllegalArgumentException] {
      tbl.offsetAt(tbl.horizon)
    }
    assert(past.getMessage.contains("horizon"), past.getMessage)
    val pastL = intercept[IllegalArgumentException] {
      tbl.localToInstant(tbl.horizon - 1000, Long.MinValue)
    }
    assert(pastL.getMessage.contains("horizon"), pastL.getMessage)
    intercept[java.time.DateTimeException] {
      TzTable.of("America/Nowhere")
    }
    // the baked table ends where it claims: the last transition is in
    // the final pre-horizon years (recurring rules were materialized,
    // not dropped at the last historic entry)
    assert(tbl.trans.last > tbl.horizon - 2L * 366 * 86400,
      s"last transition ${tbl.trans.last} vs horizon ${tbl.horizon}")
  }
}
