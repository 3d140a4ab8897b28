package graft

/** Battery bookkeeping invariants — the drift class of bug where the code,
  * the oracle map, and the docs disagree about what exists.
  */
class BatterySpec extends SparkTestBase {

  test("every oracle entry names a registered query; counts are consistent") {
    val dangling = Queries.oracles.keySet -- Queries.all.keySet
    assert(dangling.isEmpty, s"oracle SQL for unregistered queries: $dangling")
    assert(Queries.all.size >= 242, s"battery shrank to ${Queries.all.size}")
    assert(Queries.oracles.size >= 226, s"oracle coverage shrank to ${Queries.oracles.size}")
  }

  test("query names follow the qNN_/dNN_ convention with unique numbers") {
    val ids = Queries.all.keySet.map(_.takeWhile(_ != '_'))
    assert(ids.size == Queries.all.size, "duplicate query number prefixes")
    assert(Queries.all.keySet.forall(_.matches("[qd]\\d{2,3}_[a-z0-9_]+")))
  }

  test("d202's reflection identity equals the sequential Lindley fold on real data") {
    // the closed form b_t = S_t - min(0, runmin(S)) is the load-bearing
    // claim — pin it against the literal recursion b_t = max(0, b + δ)
    val rows = Queries.d202ClampedBalance(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts_ms", "event_id", "delta", "balance")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    var clampedSomewhere = false
    rows.groupBy(_._1).values.foreach { rs =>
      var bal = 0L
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, delta, got) =>
        bal = math.max(0L, bal + delta)
        if (bal == 0L && delta < 0L) clampedSomewhere = true
        assert(got == bal)
      }
    }
    assert(clampedSomewhere, "no row ever hit the floor: identity untested")
  }

  test("d204's doubled depths equal the sequential parent walk on real data") {
    val rows = Queries.d204TreeDepth(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
    assert(rows.length == 150)
    val parent = rows.map(r => r._1 -> r._2).toMap
    def walk(c: Long): Long = // acyclic by construction: parent < node
      if (parent(c) == -1L) 0L else 1L + walk(parent(c))
    rows.foreach { case (c, _, depth) => assert(depth == walk(c)) }
    assert(rows.map(_._3).max >= 5L, "forest too shallow: doubling untested")
  }

  test("d205 conserves quantity: per-part allocation = min(supply, demand)") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d).selectExpr("l_partkey",
      "l_suppkey % 2 AS par",
      "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tot = li.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    val alloc = Queries.d205FifoMatch(spark, d)
      .groupBy("l_partkey").sum("alloc_c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = li.map(_._1).distinct
    assert(parts.exists(p => tot((p, 0L)) > 0 && tot((p, 1L)) > 0))
    parts.foreach { p =>
      val want = math.min(tot((p, 0L)), tot((p, 1L)))
      assert(alloc.getOrElse(p, 0L) == want,
        s"part $p: allocated ${alloc.getOrElse(p, 0L)}, expected $want")
    }
  }

  test("d209 merged spans are disjoint, ordered, and cover every order") {
    val d = "/root/testdata/sf0.001"
    val spans = Queries.d209IntervalMerge(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orderCount = Tables.orders(spark, d).groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.groupBy(_._1).foreach { case (k, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, hi1, _), (_, lo2, _, _)) =>
          assert(hi1 < lo2, s"customer $k: spans overlap after merging")
        case _ =>
      }
      assert(sorted.map(_._4).sum == orderCount(k),
        s"customer $k: merged spans lost or double-counted orders")
      sorted.foreach { case (_, lo, hi, _) => assert(lo < hi) }
    }
    assert(spans.exists(_._4 > 1), "no span merged >1 order: merge untested")
  }

  test("d208 burst flags satisfy the integer-lift definition on real data") {
    val rows = Queries.d208BurstTerms(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // every burst row clears the floor; every from-zero row with the
    // floor IS a burst (the sparse-bucket branch)
    rows.foreach { case (_, _, cnt, prev, burst) =>
      if (burst == 1L) assert(cnt >= 3L)
      if (prev == 0L && cnt >= 3L) assert(burst == 1L)
    }
    assert(rows.exists { case (_, _, _, p, b) => p == 0L && b == 1L },
      "no burst-from-zero row: the sparse-bucket branch went unexercised")
    assert(rows.exists { case (_, _, _, p, b) => p > 0L && b == 1L },
      "no cross-multiplied burst: the lift branch went unexercised")
  }

  test("d210 KS equals the brute-force sup over empirical CDFs") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val global = docs.map(_._2).sorted
    val support = global.distinct
    val got = Queries.d210KsDrift(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val vs = rows.map(_._2)
      val (nS, nG) = (vs.length.toLong, global.length.toLong)
      val ds = support.map(v =>
        v -> math.abs(vs.count(_ <= v) * nG - global.count(_ <= v) * nS))
      val dmax = ds.map(_._2).max
      val at = ds.filter(_._2 == dmax).map(_._1).min
      assert(got(src) == ((nS, dmax, at)), s"KS mismatch for $src")
    }
    assert(got.values.exists(_._2 > 0L), "all sources identical: vacuous")
  }

  test("d211 normalization is monotone per language and hits both endpoints") {
    val rows = Queries.d211QuantileNormalize(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty)
    val globalMin = rows.map(_._3).min
    val globalMax = rows.map(_._3).max
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_._2)
      byRank.sliding(2).foreach {
        case Array((_, _, _, n1), (_, _, _, n2)) =>
          assert(n1 <= n2, s"$lang: normalization broke rank order")
        case _ =>
      }
      // endpoint laws hold only for multi-doc languages: a singleton
      // language maps to the global MEDIAN by the query's own ng==1 rule
      if (byRank.length > 1) {
        assert(byRank.head._4 == globalMin,
          s"$lang: rank 1 must map to global min")
        assert(byRank.last._4 == globalMax,
          s"$lang: top rank must map to global max")
      }
    }
    assert(rows.groupBy(_._1).values.exists(_.size > 1),
      "every language is a singleton: endpoint laws untested")
    assert(rows.exists(r => r._3 != r._4), "nothing moved: vacuous")
  }

  test("d206 allocates exactly 10000 seats, each cell base or base+1") {
    val rows = Queries.d206Apportionment(spark, "/root/testdata/sf0.001")
      .select("base_seats", "seats").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == 10000L, "largest-remainder must hit S exactly")
    assert(rows.forall { case (b, s) => s == b || s == b + 1 })
    assert(rows.exists { case (b, s) => s == b + 1 },
      "no remainder seat assigned: rank path untested")
  }

  test("d215: collocation floor holds and PMI separates both signs") {
    val rows = Queries.d215PmiCollocations(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 20L), "count floor leaked")
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 < 0),
      "PMI should separate attracting from repelling pairs")
  }

  test("d216: fusion keeps both-list docs above every single-list doc") {
    val rows = Queries.d216RrfFusion(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    assert(both.nonEmpty, "no doc in both lists: overlap untested")
    assert(single.nonEmpty, "no single-list doc: the NULL-rank path untested")
    // two contributions strictly dominate one: min rrf of both-list docs
    // must beat max rrf of single-list docs (1/110+1/110 > 1/61)
    assert(both.map(_.getDouble(3)).min > single.map(_.getDouble(3)).max)
  }

  test("d217: one row per weekday, indices positive and centered") {
    val rows = Queries.d217SeasonalDecomp(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == (0L to 6L).toSeq)
    assert(rows.forall(r => r._2 > 0 && r._3 > 0 && r._4 > 0))
    val idx = rows.map(_._3)
    assert(idx.min < 1.1 && idx.max > 0.9,
      s"indices implausibly skewed: ${idx.toSeq}")
  }

  test("d220: segments tile the week range; cost beats the equal-width strawman") {
    val d = "/root/testdata/sf0.001"
    val segs = Queries.d220VOptimalSegments(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(segs.length == 6)
    // contiguity in index space: n_weeks sums to the observed-week count
    val census = Tables.orders(spark, d)
      .selectExpr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 7 AS w")
      .groupBy("w").count().orderBy("w").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(segs.map(_._4).sum == census.length)
    segs.sliding(2).foreach { w =>
      assert(w(0)._3 < w(1)._2, "segment week ranges must be ordered/disjoint")
    }
    assert(segs.map(_._5).sum == census.map(_._2).sum, "counts must tile")
    assert(segs.forall(_._6 >= 0.0))
    // optimality teeth: the DP total must not exceed ANY specific
    // segmentation — here the 6 equal-width index split
    def sseOf(xs: Seq[Long]): Double = {
      val n = xs.length; val sm = xs.sum; val q = xs.map(x => x * x).sum
      q.toDouble - sm.toDouble * sm.toDouble / n.toDouble
    }
    val xs = census.map(_._2).toSeq
    val cuts = (0 to 6).map(k => k * xs.length / 6)
    val strawman = (0 until 6)
      .map(k => sseOf(xs.slice(cuts(k), cuts(k + 1)))).sum
    assert(segs.map(_._6).sum <= strawman + 1e-6,
      s"DP ${segs.map(_._6).sum} worse than equal-width $strawman")
  }

  test("d221: growing the ring only moves keys TO the new node") {
    val rows = Queries.d221RendezvousRebalance(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (n5, n6, _) => n5 == n6 || n6 == 5L },
      s"HRW monotonicity violated: ${rows.toSeq}")
    assert(rows.map(_._1).distinct.sorted.toSeq == (0L to 4L).toSeq,
      "every old node should hold keys")
    val total = rows.map(_._3).sum.toDouble
    val moved = rows.filter(r => r._1 != r._2).map(_._3).sum.toDouble
    assert(moved / total > 1.0 / 12 && moved / total < 1.0 / 3,
      s"moved fraction ${moved / total} far from the expected 1/6")
  }

  test("d223: rule metrics are internally consistent") {
    val rows = Queries.d223AssociationRules(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sab, sa, sb, nb) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(a < b, "pairs must be ordered")
      assert(sab >= 20L && sab <= math.min(sa, sb))
      assert(math.abs(r.getDouble(6) - sab.toDouble / sa) < 1e-6)
      assert(r.getDouble(6) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(7) -
        sab.toDouble * nb / (sa.toDouble * sb)) < 1e-4)
    }
  }

  test("d225: replicate weights behave like Poisson(1) and the spread like the CLT") {
    val d = "/root/testdata/sf0.001"
    val rows = Queries.d225PoissonBootstrap(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 32)
    val n = Tables.orders(spark, d).count()
    // E[n_eff] = n, sd = sqrt(n): every replicate within 5 sigma
    rows.foreach { case (b, ne, _, _) =>
      assert(math.abs(ne - n) <= 5 * math.sqrt(n.toDouble),
        s"replicate $b n_eff $ne vs n $n")
    }
    // CLT: sd of replicate means ~ sd(x)/sqrt(n), loose factor 3
    val means = rows.map(_._4)
    val mbar = means.sum / means.length
    val sdRep = math.sqrt(means.map(m => (m - mbar) * (m - mbar)).sum /
      (means.length - 1))
    val vals = Tables.orders(spark, d)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v")
      .collect().map(_.getDouble(0))
    val vbar = vals.sum / vals.length
    val sdX = math.sqrt(vals.map(v => (v - vbar) * (v - vbar)).sum /
      (vals.length - 1))
    val expect = sdX / math.sqrt(n.toDouble)
    assert(sdRep > expect / 3 && sdRep < expect * 3,
      s"bootstrap SE $sdRep vs CLT $expect")
  }

  test("d226: influence deltas reconcile with directly-computed LOGO stats") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d226SourceInfluence(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val docs = Tables.documents(spark, d)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tot = docs.map(_._2).sum.toDouble; val n = docs.length
    for ((src, (nDocs, dMean)) <- got) {
      val mine = docs.filter(_._1 == src)
      assert(mine.length == nDocs)
      val want = tot / n -
        (tot - mine.map(_._2).sum) / (n - mine.length).toDouble
      assert(math.abs(dMean - want) < 1e-5, s"$src: $dMean vs $want")
    }
    assert(got.size == docs.map(_._1).distinct.length,
      "every source must get an influence row")
  }

  test("d227's doubled products equal the sequential parent walk on real data") {
    val rows = Queries.d227BomExplosion(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(3)))
    assert(rows.length == 150)
    val parent = rows.map(r => r._1 -> r._2).toMap
    def walk(c: Long): Long =
      if (parent(c) == -1L) 1L else (c % 5 + 2) * walk(parent(c))
    rows.foreach { case (c, _, eff) => assert(eff == walk(c), s"node $c") }
    assert(rows.map(_._3).max >= 64L,
      "forest too shallow: multi-hop products untested")
  }

  test("d228: the funnel is monotone per source and every early stage bites") {
    val rows = Queries.d228CurationPipeline(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, in, de, qu, cl, sh, tk) =>
      assert(in >= de && de >= qu && qu >= cl, s"$src: funnel not monotone")
      assert((cl > 0) == (sh > 0), s"$src: shards exist iff docs survive")
      assert((cl > 0) == (tk > 0), s"$src: tokens exist iff docs survive")
    }
    // global teeth: dedup and the quality gate must each actually drop
    def tot(f: ((String, Long, Long, Long, Long, Long, Long)) => Long) =
      rows.map(f).sum
    assert(tot(_._2) > tot(_._3), "dedup dropped nothing: vacuous")
    assert(tot(_._3) > tot(_._4), "quality gate dropped nothing: vacuous")
    assert(tot(_._5) > 0, "nothing survived to packing")
  }

  test("d229: modularity identities — degrees sum to 2m, Q bounded, contributions reconcile") {
    val d = "/root/testdata/sf0.001"
    val rows = Queries.d229BrandModularity(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val m = graft.operators.GraphOps.coOccurrenceEdges(
      Tables.lineitem(spark, d).selectExpr("l_orderkey AS g", "l_partkey AS i"),
      "g", "i", minCount = 2L).count()
    assert(rows.map(_._3).sum == 2 * m, "degree sums must total 2m")
    assert(rows.map(_._4).sum <= m, "intra edges cannot exceed m")
    val q = rows.map { case (_, _, ds, ei, _) =>
      (4.0 * m * ei - ds.toDouble * ds) / (4.0 * m * m)
    }.sum
    assert(q > -1.0 && q < 1.0, s"modularity $q out of range")
    rows.foreach { case (b, _, ds, ei, contrib) =>
      val want = (4.0 * m * ei - ds.toDouble * ds) / (4.0 * m * m)
      assert(math.abs(contrib - want) < 1e-8, s"$b contribution drifted")
    }
  }

  test("d230: greedy picks match an independent in-memory greedy; gains non-increasing") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d230GreedyCoverage(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == 8)
    // submodularity: greedy marginal gains never increase
    got.sliding(2).foreach { w => assert(w(0)._3 >= w(1)._3, "gain rose") }
    assert(got.map(_._2).distinct.length == 8, "a doc was picked twice")
    assert(got.map(_._3).sum == got.last._4, "cum must be the gain prefix sum")
    // independent reference: in-memory greedy over the same incidence
    val inc = Tables.documents(spark, d)
      .where("text IS NOT NULL")
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id",
        "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '') AS t")
      .where("size(t) >= 5")
      .selectExpr("doc_id",
        "explode(transform(sequence(1, size(t) - 4), i -> array_join(slice(t, i, 5), ' '))) AS gram")
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val covered = collection.mutable.Set.empty[String]
    got.foreach { case (_, doc, gain, _) =>
      val best = byDoc.view.mapValues(g => (g -- covered).size)
        .filter(_._2 > 0).toSeq
        .sortBy { case (id, g) => (-g, id) }.head
      assert(best._1 == doc && best._2 == gain,
        s"greedy divergence: engine ($doc, $gain) vs reference $best")
      covered ++= byDoc(doc)
    }
  }

  test("d231: windowed first-crossing equals a sequential walk; all outcomes present") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d231SprtDecision(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val trials = Queries.sprtSteps(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.size == trials.map(_._1).distinct.length)
    // independent reference: the literal absorbing fold per user
    trials.groupBy(_._1).foreach { case (u, rs) =>
      var cum = 0L; var n = 0L
      var dec: Option[(String, Long, Long)] = None
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, step) =>
        if (dec.isEmpty) {
          cum += step; n += 1
          if (cum >= 12L) dec = Some(("accept", n, cum))
          else if (cum <= -12L) dec = Some(("reject", n, cum))
        }
      }
      val want = dec.getOrElse(("open", n, cum))
      assert(got(u) == want, s"user $u: engine ${got(u)} vs walk $want")
    }
    // teeth: a bound that only ever accepts (or never fires) tests nothing
    val kinds = got.values.map(_._1).toSet
    assert(kinds == Set("accept", "reject", "open"),
      s"decision outcomes $kinds: a branch went unexercised")
  }

  test("d233: k-center picks match an independent Gonzalez run; radius non-increasing") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d233KcenterCoreset(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 6)
    assert(got.map(_._2).distinct.length == 6, "a center was picked twice")
    got.drop(1).sliding(2).foreach { w =>
      assert(w(0)._3 >= w(1)._3, "coverage radius rose: not a greedy max-min")
    }
    assert(got.last._3 > 0L, "radius collapsed to 0: degenerate geometry")
    // independent reference: in-memory Gonzalez over the same features
    val pts = Queries.kcenterFeatures(spark, d).collect()
      .map(r => r.getLong(0) -> Array(r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = List(pts.head._2)
    var picks = List((pts.head._1, 0L))
    val dmin = collection.mutable.Map(
      pts.map { case (k, f) => k -> d2(f, centers.head) }: _*)
    for (_ <- 2 to 6) {
      val (pk, pd) = pts.map { case (k, _) => (k, dmin(k)) }
        .maxBy { case (k, dd) => (dd, -k) }
      picks ::= (pk, pd)
      val pf = pts.find(_._1 == pk).get._2
      pts.foreach { case (k, f) =>
        dmin(k) = math.min(dmin(k), d2(f, pf))
      }
    }
    assert(got.map(r => (r._2, r._3)).toList == picks.reverse,
      "engine picks diverge from the reference Gonzalez run")
  }

  test("d234: pairs are exactly the reciprocal best matches; filter non-trivial") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d234MutualNn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no mutual pair at all")
    // independent reference: brute-force block-local argmins in memory
    def side(src: String) = Tables.documents(spark, d)
      .where(s"source = '$src' AND text IS NOT NULL")
      .selectExpr("CAST(doc_id AS BIGINT) AS id",
        "CAST(size(filter(split(trim(text), '\\\\s+'), x -> x != '')) AS BIGINT) * 8 AS t",
        "CAST(n_chars AS BIGINT) AS c", "CAST(n_chars AS BIGINT) div 64 AS blk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val as = side("src2"); val bs = side("src3")
    val cand = for {
      (ai, at, ac, ab) <- as; (bi, bt, bc, bb) <- bs if ab == bb
    } yield (ai, bi, (at - bt) * (at - bt) + (ac - bc) * (ac - bc))
    val bestA = cand.groupBy(_._1).view.mapValues(
      _.minBy(p => (p._3, p._2))).values.toSet
    val bestB = cand.groupBy(_._2).view.mapValues(
      _.minBy(p => (p._3, p._1))).values.toSet
    assert(got == (bestA intersect bestB),
      "mutual set differs from reciprocal best-match reference")
    // teeth: reciprocity must REJECT some one-directional best, or the
    // mutual filter is vacuous on this data
    assert(got.size < bestA.size, "every best match was mutual: filter untested")
  }

  test("d235: window pairs match a driver-side sort; SNM finds the planted dups") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d235SortedNeighborhood(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    // independent reference: sort the corpus in memory, enumerate the
    // w=4 window
    val docs = Tables.documents(spark, d).where("text IS NOT NULL")
      .selectExpr("CAST(doc_id AS BIGINT) AS id",
        "concat(concat_ws(' ', slice(filter(split(trim(lower(text)), '\\\\s+'), x -> x != ''), 1, 3)), '|', lpad(CAST(doc_id AS STRING), 12, '0')) AS ord",
        "concat_ws(' ', array_sort(array_distinct(filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')))) AS ck")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getString(2)))
      .sortBy(_._1)
    val want = (for {
      i <- docs.indices; g <- 1 to 3 if i + g < docs.length
    } yield (docs(i)._2, docs(i + g)._2, g.toLong,
      if (docs(i)._3 == docs(i + g)._3) 1L else 0L)).toSet
    assert(got == want, "window pairs diverge from the in-memory sort")
    // teeth: the sort must place at least one planted duplicate pair
    // inside the window, and most neighbors must NOT be dups
    assert(got.exists(_._4 == 1L), "SNM never saw a duplicate: recall untested")
    assert(got.exists(_._4 == 0L), "every neighbor a dup: degenerate corpus")
  }

  test("d237: the JW gate discriminates, and catches a pair the token-set key misses") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d237JaroLinkage(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // discrimination: the gate must reject most same-block candidates
    val titles = Tables.documents(spark, d).where("text IS NOT NULL")
      .selectExpr("CAST(doc_id AS BIGINT) AS id",
        "concat_ws(' ', slice(filter(split(trim(lower(text)), '\\\\s+'), x -> x != ''), 1, 5)) AS nm",
        "element_at(filter(split(trim(lower(text)), '\\\\s+'), x -> x != ''), 1) AS blk",
        "concat_ws(' ', array_sort(array_distinct(filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')))) AS ck")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val nCand = (for {
      (ai, _, ab, _) <- titles; (bi, _, bb, _) <- titles
      if ab == bb && ai < bi
    } yield 1).size
    assert(got.size * 10 < nCand,
      s"gate kept ${got.size} of $nCand candidates: no discrimination")
    // the capability claim: at least one linked pair shares NO canonical
    // token-set key — the EDIT-pattern match d212/d235's keys can't see
    val ckOf = titles.map(t => t._1 -> t._4).toMap
    assert(got.exists { case (a, b) => ckOf(a) != ckOf(b) },
      "every JW pair is already an exact token-set dup: fuzzy layer vacuous")
  }

  test("d242: each epoch is a full permutation; epochs genuinely differ; reruns agree") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d242EpochShuffle(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet == Set(1L, 2L, 3L))
    val shardSet = byEpoch(1L).map(t => (t._3, t._4)).toSet
    byEpoch.foreach { case (e, rows) =>
      // complete permutation: positions are exactly 1..n over the same set
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"epoch $e positions are not a contiguous rank")
      assert(rows.map(t => (t._3, t._4)).toSet == shardSet,
        s"epoch $e shard set drifted")
    }
    // the shuffles must actually differ epoch to epoch (md5 re-keys)
    def order(e: Long) = byEpoch(e).sortBy(_._2).map(t => (t._3, t._4)).toSeq
    assert(order(1L) != order(2L) && order(2L) != order(3L),
      "epochs produced identical orders: the per-epoch key is dead")
    // and reruns reproduce the identical sequences (restart contract)
    val again = Queries.d242EpochShuffle(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(again.sorted.toSeq == got.sorted.toSeq, "rerun diverged")
  }

  test("d239: shard payload md5 equals a doc_id-ordered in-memory concat") {
    val d = "/root/testdata/sf0.001"
    val got = Queries.d239ShardText(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    // order matters only in multi-doc bins — they must exist
    assert(got.values.exists(_._1 > 1), "every bin held one doc: order untested")
    // independent reference: per (source, bin), docs sorted by doc_id,
    // joined by \n, hashed with MessageDigest
    val rows = Tables.documents(spark, d).where("text IS NOT NULL")
      .selectExpr("source", "CAST(doc_id AS BIGINT) AS doc_id", "text",
        "CAST(size(filter(split(trim(text), '\\\\s+'), x -> x != '')) AS BIGINT) AS ntok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val recon = collection.mutable.Map.empty[(String, Long),
      collection.mutable.ListBuffer[(Long, String)]]
    rows.groupBy(_._1).foreach { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, id, text, ntok) =>
        val bin = cum / 512; cum += ntok
        recon.getOrElseUpdate((src, bin),
          collection.mutable.ListBuffer.empty) += ((id, text))
      }
    }
    recon.foreach { case (key, buf) =>
      val payload = buf.sortBy(_._1).map(_._2).mkString("\n")
      val hash = md.digest(payload.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val (nDocs, gotHash, nChars) = got(key)
      // code points, not UTF-16 units — both engines' length() counts
      // code points, and a supplementary-plane char would split the two
      assert(nDocs == buf.length && gotHash == hash &&
        nChars == buf.map(t =>
          t._2.codePointCount(0, t._2.length).toLong).sum,
        s"shard $key diverged from the ordered reconstruction")
    }
    assert(recon.keySet == got.keySet, "bin sets differ")
  }
}
