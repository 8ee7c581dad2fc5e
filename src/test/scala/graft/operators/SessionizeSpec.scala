package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], gap: Long, cap: Long)
      : Seq[(Long, Long, Long, Long, Boolean)] =
    Sessionize.cappedSessions(rows.toDF("k", "t", "i"), "k", "t", "i",
        gap, cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(x => (x._1, x._2, x._3))

  test("cap forces rotation under CONTINUOUS activity — the case the " +
      "gap-indicator prefix sum cannot express") {
    // one event every 600 s for 10 h: no gap ever exceeds 1800, yet
    // cap=7200 must split. Session 0 holds t=0..7200 (t-start <= cap),
    // breaks at 7800; session 1 holds 7800..15000; session 2 from 15600
    val evs = (0 until 60).map(j => (1L, j * 600L, j.toLong))
    val out = run(evs, gap = 1800L, cap = 7200L)
    val bySess = out.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
    assert(bySess(0L) === (0 to 12).map(_ * 600L))  // 0..7200
    assert(bySess(1L).head === 7800L && bySess(1L).last === 15000L)
    assert(out.filter(_._5).map(_._2).take(3) === Seq(0L, 7800L, 15600L))
    // every session's span respects the cap
    bySess.values.foreach(ts => assert(ts.last - ts.head <= 7200L))
  }

  test("gap rule still breaks, keys reset independently, ties resolve " +
      "by id") {
    val evs = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 5000L, 3L),  // gap 4900 > 1800
      (2L, 0L, 1L),                                   // fresh key
      (3L, 50L, 2L), (3L, 50L, 1L))                   // tie → id order
    val out = run(evs, gap = 1800L, cap = 100000L)
    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._4) === Seq(0L, 0L, 1L))
    assert(out.filter(_._1 == 2L).head._4 === 0L)
    val k3 = out.filter(_._1 == 3L).sortBy(_._3)
    assert(k3.map(_._4) === Seq(0L, 0L)) // one session, both ties in it
    assert(k3.find(_._3 == 1L).get._5, "lower id is the session start")
  }

  test("matches an independent sequential replay on a seeded log") {
    val rnd = new scala.util.Random(7)
    val evs = (0 until 500).map { j =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, j.toLong)
    }
    val (gap, cap) = (900L, 3600L)
    val got = run(evs, gap, cap)
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var sess = -1L; var start = 0L; var prev = 0L
      es.sortBy(e => (e._2, e._3)).map { case (_, t, i) =>
        val isNew = sess < 0 || t - prev > gap || t - start > cap
        if (isNew) { sess += 1; start = t }
        prev = t
        (k, t, i, sess, isNew)
      }
    }.sortBy(x => (x._1, x._2, x._3))
    assert(got === expect)
  }

  private def runDebounce(rows: Seq[(Long, Long, Long)], w: Long)
      : Seq[(Long, Long, Long, Boolean)] =
    Sessionize.debounce(rows.toDF("k", "t", "i"), "k", "t", "i", w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
      .sortBy(x => (x._1, x._2, x._3))

  test("debounce keeps relative to the last KEPT event — the chain " +
      "case a bucket-distinct gets wrong") {
    // window 600: t=0 kept; 300 dropped; 650 kept (650-0 >= 600);
    // 1200 DROPPED (1200-650 = 550 < 600, though a 600-bucket
    // distinct would keep it); 1250 kept.
    val out = runDebounce(Seq((1L, 0L, 0L), (1L, 300L, 1L),
      (1L, 650L, 2L), (1L, 1200L, 3L), (1L, 1250L, 4L)), 600L)
    assert(out.map(_._4) === Seq(true, false, true, false, true))
  }

  test("debounce matches an independent sequential replay; ties " +
      "resolve by id; keys independent") {
    val rnd = new scala.util.Random(11)
    val evs = (0 until 600).map { j =>
      (rnd.nextInt(7).toLong, rnd.nextInt(5000).toLong, j.toLong)
    }
    val w = 250L
    val got = runDebounce(evs, w)
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var last = Long.MinValue
      es.sortBy(e => (e._2, e._3)).map { case (_, t, i) =>
        val kept = last == Long.MinValue || t - last >= w
        if (kept) last = t
        (k, t, i, kept)
      }
    }.sortBy(x => (x._1, x._2, x._3))
    assert(got === expect)
  }

  test("greedySchedule accepts an OPTIMAL-size set per key (vs an " +
      "independent DP) and accepted intervals never overlap") {
    val rnd = new scala.util.Random(31)
    val ivs = (1L to 300L).map { i =>
      val k = i % 7
      val s = rnd.nextInt(200).toLong
      (k, s, s + 1 + rnd.nextInt(30), i)
    }
    val got = Sessionize.greedySchedule(
        ivs.toDF("k", "s", "e", "i"), "k", "s", "e", "i")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // optimal count by the classic DP: sort by end; opt(j) =
    // max(opt(j-1), 1 + opt(last compatible before j))
    def optCount(xs: Seq[(Long, Long)]): Int = {
      val by = xs.sortBy(x => (x._2, x._1))
      val opt = Array.ofDim[Int](by.length + 1)
      for (j <- 1 to by.length) {
        val (s, _) = by(j - 1)
        val p = by.take(j - 1).lastIndexWhere(_._2 <= s) + 1
        opt(j) = math.max(opt(j - 1), 1 + opt(p))
      }
      if (by.isEmpty) 0 else opt(by.length)
    }
    for (k <- 0L until 7L) {
      val mine = got.filter(_._1 == k)
      val acc = mine.filter(_._5).sortBy(_._2)
      // no two accepted intervals overlap (half-open)
      acc.sliding(2).foreach {
        case Array(a, b) => assert(b._2 >= a._3, s"overlap in key $k")
        case _ =>
      }
      assert(acc.length ===
        optCount(ivs.filter(_._1 == k).map(x => (x._2, x._3))),
        s"greedy must be optimal for key $k")
    }
  }

  test("rateLimit matches an independent sequential replay; bursts " +
      "drain the bucket, idle time refills it, cap binds") {
    val rnd = new scala.util.Random(47)
    // bursts (same-second packs) and idle stretches per key
    val evs = (1L to 400L).map { i =>
      val k = i % 5
      (k, (i / 5) * (if (k == 0) 1L else 700L) + rnd.nextInt(3),
        i)
    }
    val (cap, cost, num, den) = (3000L, 1000L, 1000L, 600L)
    val got = Sessionize.rateLimit(evs.toDF("k", "t", "i"),
        "k", "t", "i", cap, cost, num, den)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var tok = cap; var lt = Long.MinValue
      es.sortBy(e => (e._2, e._3)).map { case (_, t, i) =>
        if (lt == Long.MinValue) lt = t
        tok = math.min(cap, tok + (t - lt) * num / den)
        lt = t
        val ok = tok >= cost
        if (ok) tok -= cost
        (k, t, i, ok)
      }
    }.toSet
    assert(got === expect)
    // key 0 fires every ~second against a 1-token-per-600 s refill:
    // denials must occur; keys spaced 700 s refill ≥ cost per gap,
    // so they never drain below one token
    assert(got.exists(e => e._1 == 0L && !e._4))
    assert(got.filter(_._1 == 1L).forall(_._4))
  }

  test("wilderSmooth matches an independent sequential replay; state " +
      "resets per key; RSI pins to 1e6/0 on monotone series") {
    val rnd = new scala.util.Random(53)
    val evs = (0L until 300L).map { i =>
      val k = (i % 4).toString
      // keys 0-1 random walks; key 2 strictly rising; key 3 falling
      // slopes must exceed n=14 per step or the integer smoothing
      // floors every increment to 0 and AG/AL never move
      val v = (i % 4) match {
        case 2 => 1000L + (i / 4) * 1000L
        case 3 => 900000L - (i / 4) * 1000L
        case _ => 5000L + rnd.nextInt(2000)
      }
      (k, i / 4, v)
    }
    val n = 14
    val got = Sessionize.wilderSmooth(evs.toDF("k", "t", "v"),
        "k", "t", "v", n)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var ag = 0L; var al = 0L; var prev = 0L; var have = false
      es.sortBy(_._2).map { case (_, t, v) =>
        if (have) {
          ag = (ag * (n - 1) + math.max(v - prev, 0L)) / n
          al = (al * (n - 1) + math.max(prev - v, 0L)) / n
        }
        prev = v; have = true
        val rsi = if (ag + al > 0) Some(1000000L * ag / (ag + al))
          else None
        (k, t, v, ag, al, rsi)
      }
    }.toSet
    assert(got === expect)
    // monotone-up key: every loss is 0, so once a gain lands RSI is
    // exactly 1e6; monotone-down the dual 0
    val up = got.filter(e => e._1 == "2" && e._6.isDefined)
    assert(up.nonEmpty && up.forall(_._6.contains(1000000L)))
    val dn = got.filter(e => e._1 == "3" && e._6.isDefined)
    assert(dn.nonEmpty && dn.forall(_._6.contains(0L)))
  }
}
