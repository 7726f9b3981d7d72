package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

case class Row3(k: Long, v: Double, s: String)

/** Differential testing beyond the fixed oracle corpus: random datasets and
  * random predicate/aggregation shapes, with expected results computed by
  * an independent in-memory Scala reference implementation (BigDecimal for
  * the exact-sum paths, plain collections for relational semantics). The
  * DuckDB oracle checks 63 fixed queries on fixed data; this closes the
  * loop on arbitrary inputs.
  */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[Row3]] =
    Gen.listOfN(
      60,
      for {
        k <- Gen.choose(0L, 8L)
        v <- Gen.choose(-1000.0, 1000.0)
        s <- Gen.oneOf("red", "green", "blue", "")
      } yield Row3(k, math.rint(v * 100) / 100, s)
    )

  private def samples(n: Int): Seq[List[Row3]] =
    (0 until n).flatMap(i => rowsGen.apply(Gen.Parameters.default, rng.Seed(1234L + i)))

  test("random filters: Spark matches the in-memory reference") {
    type Pred = (Row3 => Boolean, org.apache.spark.sql.Column)
    def predicates(thr: Double): Seq[Pred] = Seq(
      (r => r.v > thr, col("v") > thr),
      (r => r.k % 2 == 0 && r.v <= thr, col("k") % 2 === 0 && col("v") <= thr),
      (r => r.s == "red" || r.v.abs > 500, col("s") === "red" || abs(col("v")) > 500),
      (r => r.s.nonEmpty && r.k > 3, length(col("s")) > 0 && col("k") > 3)
    )
    samples(4).zipWithIndex.foreach { case (rows, i) =>
      val df  = rows.toDF()
      val thr = -200.0 + i * 150.0
      predicates(thr).foreach { case (ref, sparkPred) =>
        val expected = rows.filter(ref).map(r => (r.k, r.v, r.s)).sorted
        val got = df.filter(sparkPred).as[Row3].collect().map(r => (r.k, r.v, r.s)).sorted.toSeq
        assert(got === expected, s"seed=$i pred=$sparkPred")
      }
    }
  }

  test("random grouped aggregates: decimal-path sums match BigDecimal reference") {
    samples(4).foreach { rows =>
      val df = rows.toDF()
      val got = df
        .groupBy("k")
        .agg(
          sum(col("v").cast("decimal(18,4)")).cast("double").as("s"),
          count(lit(1)).as("n"),
          min("v").as("mn"),
          max("v").as("mx")
        )
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      val expected = rows.groupBy(_.k).map { case (k, rs) =>
        val exact = rs.map(r => BigDecimal(r.v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        k -> ((exact.toDouble, rs.size.toLong, rs.map(_.v).min, rs.map(_.v).max))
      }
      assert(got === expected)
    }
  }

  test("random window ranks: row_number/lag match the reference") {
    samples(3).foreach { rows =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v"), col("s"))
      val got = rows.toDF()
        .select(col("k"), col("v"), col("s"),
          row_number().over(w).as("rn"), lag("v", 1).over(w).as("lg"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSet
      val expected = rows.groupBy(_.k).flatMap { case (k, rs) =>
        val sorted = rs.map(r => (r.v, r.s)).sorted
        sorted.zipWithIndex.map { case ((v, s), idx) =>
          (k, v, s, idx + 1, if (idx == 0) None else Some(sorted(idx - 1)._1))
        }
      }.toSet
      assert(got === expected)
    }
  }

  test("random graphs: connectedComponents matches a local union-find") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n     <- Gen.choose(5, 60) // node universe size
      m     <- Gen.choose(0, 90) // edge count (self-loops and duplicates allowed)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges

    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // union toward min
      }
      // normalize: every node labeled by the min of its component
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
    }

    (0 until 8).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, rng.Seed(4321L + i)).get
      if (edges.nonEmpty) {
        val got = graft.operators.Dedup
          .connectedComponents(edges.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        assert(got === unionFind(edges), s"seed ${4321L + i}: ${edges.take(10)}...")
      }
    }
  }

  test("random corpora: ngramJaccardPairs matches brute-force shingle Jaccard") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen: Gen[List[(Long, String)]] = for {
      n    <- Gen.choose(4, 16)
      docs <- Gen.listOfN(n, Gen.choose(3, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def bruteForce(docs: List[(Long, String)], k: Int, thr: Double): Map[(Long, Long), Double] = {
      def shingles(t: String): Set[String] = {
        val toks = t.toLowerCase.split(" ").filter(_.nonEmpty)
        if (toks.length < k) Set.empty
        else toks.sliding(k).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = sa.intersect(sb).size
        if inter > 0
        jac = inter.toDouble / sa.union(sb).size
        if jac >= thr
      } yield (a, b) -> (math.rint(jac * 1e9) / 1e9)).toMap
    }

    for (i <- 0 until 6; thr <- Seq(0.0, 0.4)) {
      val docs = docGen(Gen.Parameters.default, rng.Seed(99L + i)).get
      val got = graft.operators.Dedup
        .ngramJaccardPairs(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), 3, thr)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      assert(got === bruteForce(docs, 3, thr), s"seed ${99L + i} thr=$thr")
    }
  }

  test("sort-based exact percentile matches Spark's percentile aggregate on random data") {
    // c10_percentile hand-rolls (n-1)p rank selection + linear
    // interpolation over a window sort; this pins it to the engine
    // aggregate's semantics on arbitrary data (both use
    // lower + (pos - lowerIndex) * (higher - lower)).
    import org.apache.spark.sql.expressions.Window
    for (rowset <- samples(4)) {
      val rows = rowset.map(r => (r.k % 3, r.v))
      val df   = rows.toDF("g", "v")
      val wR   = Window.partitionBy(col("g")).orderBy(col("v"))
      val wA   = Window.partitionBy(col("g"))
      val ranked = df
        .withColumn("rn", row_number().over(wR).cast("long") - 1L)
        .withColumn("n", count(lit(1)).over(wA))
      def pct(p: Double) = {
        val r  = (col("n") - 1L).cast("double") * p
        val lo = max(when(col("rn") === floor(r).cast("long"), col("v")))
        val hi = max(when(col("rn") === ceil(r).cast("long"), col("v")))
        val rr = (first(col("n")) - 1L).cast("double") * p
        (lo + (rr - floor(rr)) * (hi - lo)).as(s"p")
      }
      for (p <- Seq(0.25, 0.5, 0.9)) {
        val viaSort = ranked.groupBy("g").agg(pct(p)).as[(Long, Double)].collect().toMap
        val viaAgg = df.groupBy("g").agg(expr(s"percentile(v, $p)").as("p"))
          .as[(Long, Double)].collect().toMap
        viaSort.foreach { case (g, v) =>
          assert(math.abs(v - viaAgg(g)) < 1e-9, s"g=$g p=$p sort=$v agg=${viaAgg(g)}")
        }
      }
    }
  }

  test("random join: inner equi-join matches the reference cross-check") {
    val pairs = samples(2)
    val left  = pairs.head
    val right = pairs.last
    val got = left.toDF().select(col("k"), col("v").as("lv"))
      .join(right.toDF().select(col("k").as("rk"), col("v").as("rv")), col("k") === col("rk"))
      .select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    val expected = (for {
      l <- left; r <- right if l.k == r.k
    } yield (l.k, l.v, r.v)).sorted
    assert(got === expected)
  }

  test("random hash sets: OPH estimate tracks exact Jaccard within the k-bound") {
    import graft.functions.{MinHashSketch, TextOps}
    // 40 random set pairs with overlap drawn across (0, 1); at k = 256 the
    // one-permutation estimator's std error is <= ~1/sqrt(k) ≈ 0.0625 —
    // assert 4 sigma. Deterministic seeds, so no flake.
    val k = 256
    (0 until 40).foreach { i =>
      val rnd   = new scala.util.Random(9000 + i)
      val nA    = 50 + rnd.nextInt(400)
      val share = rnd.nextDouble()
      val base  = Array.tabulate(nA)(j => TextOps.splitmix64(j.toLong * 2654435761L + i))
      val nSh   = (nA * share).toInt
      val b     = base.take(nSh) ++
        Array.tabulate(nA - nSh)(j => TextOps.splitmix64((j + 7919).toLong * 968665207L + i))
      val exact = {
        val (xa, xb) = (base.toSet, b.toSet)
        xa.intersect(xb).size.toDouble / xa.union(xb).size
      }
      val est = MinHashSketch.estimateJaccard(
        TextOps.ophSignature64(base, k), TextOps.ophSignature64(b, k))
      assert(math.abs(est - exact) < 0.25, s"pair $i: est=$est exact=$exact")
    }
  }

  test("random graphs: distributed PageRank matches an in-memory reference exactly") {
    import graft.operators.PageRank
    // The reference replicates the operator's arithmetic bit for bit:
    // per-edge contributions rounded to DECIMAL(38,18) exactly as Spark's
    // double->decimal cast does (scala BigDecimal(Double) parses
    // Double.toString — the SHORTEST decimal form, not the exact binary
    // expansion — then HALF_UP to scale 18), summed exactly, dangling mass
    // redistributed — so the comparison is EXACT double equality, not a
    // tolerance.
    def reference(edges: List[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
      val verts  = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n      = verts.size
      val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      var rank   = verts.map(_ -> 1.0).toMap
      (0 until iters).foreach { _ =>
        val danglingDec = verts.filterNot(outDeg.contains)
          .map(v => new java.math.BigDecimal(java.lang.Double.toString(rank(v)))
            .setScale(18, java.math.RoundingMode.HALF_UP))
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        val dangling = danglingDec.doubleValue()
        val contrib = scala.collection.mutable.Map.empty[Long, java.math.BigDecimal]
        edges.foreach { case (s, t) =>
          val c = new java.math.BigDecimal(java.lang.Double.toString(rank(s) / outDeg(s)))
            .setScale(18, java.math.RoundingMode.HALF_UP)
          contrib(t) = contrib.getOrElse(t, java.math.BigDecimal.ZERO).add(c)
        }
        rank = verts.map { v =>
          val cs = contrib.getOrElse(v, java.math.BigDecimal.ZERO).doubleValue()
          v -> ((1.0 - d) + d * (cs + dangling / n))
        }.toMap
      }
      rank
    }
    (0 until 5).foreach { i =>
      val rnd = new scala.util.Random(777 + i)
      val n   = 5 + rnd.nextInt(25)
      val m   = 1 + rnd.nextInt(60)
      val edges = List.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
      val got = PageRank
        .run(edges.toDF("s", "d"), col("s"), col("d"), iterations = 6)
        .as[(Long, Double)].collect().toMap
      val want = reference(edges, 6, 0.85)
      assert(got === want, s"seed ${777 + i}")
    }
  }

  test("random events: asOfNearest matches a per-left in-memory scan") {
    import java.sql.Timestamp
    import graft.operators.AsOfJoin
    (0 until 4).foreach { i =>
      val rnd = new scala.util.Random(4242 + i)
      def t(off: Long) = new Timestamp(1700000000000L + off * 1000L)
      val left = List.tabulate(80)(j =>
        (j.toLong, rnd.nextInt(6).toLong, t(rnd.nextInt(100000).toLong)))
      val right = List.tabulate(120)(j =>
        (1000L + j, rnd.nextInt(6).toLong, t(rnd.nextInt(100000).toLong)))
      val tol = 20000L // seconds
      val got = AsOfJoin
        .asOfNearest(
          left.toDF("lid", "k", "lt"), right.toDF("rid", "rk", "rt"),
          leftId = col("lid"), leftKey = col("k"), rightKey = col("rk"),
          leftTime = col("lt"), rightTime = col("rt"),
          tieBreak = Seq(col("rid").asc), toleranceSeconds = Some(tol))
        .select("lid", "rid").as[(Long, Long)].collect().toMap
      // reference: scan each left row's key-matching candidates; min
      // (|Δ|, rightTime, rid) — the operator's declared total order
      val want = left.flatMap { case (lid, k, lt) =>
        val cands = right.filter { case (_, rk, rt) =>
          rk == k && math.abs(rt.getTime - lt.getTime) <= tol * 1000L
        }
        if (cands.isEmpty) None
        else {
          val best = cands.minBy { case (rid, _, rt) =>
            (math.abs(rt.getTime - lt.getTime), rt.getTime, rid)
          }
          Some(lid -> best._1)
        }
      }.toMap
      assert(got === want, s"seed ${4242 + i}")
    }
  }

  test("random corpora: byte-level BPE trainer matches a naive in-memory reference") {
    import graft.operators.Bpe
    // independent reference: regex pretokenize + byte symbolize + the
    // textbook quadratic merge loop, structured differently from the
    // production trainer (no mutable in-place merge — rebuilt lists)
    def reference(texts: Seq[String], numMerges: Int): List[(Int, String, String)] = {
      val p = java.util.regex.Pattern.compile(Bpe.PretokenPattern)
      // independent re-derivation of GPT-2's bytes_to_unicode table
      val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
      val b2c  = { var n = 0; (0 until 256).map { b =>
        if (keep(b)) b.toChar else { val c = (256 + n).toChar; n += 1; c } } }
      def symbolize(pt: String): List[String] =
        pt.getBytes("UTF-8").toList.map(b => b2c(b & 0xff).toString)
      val words = scala.collection.mutable.Map.empty[List[String], Long]
      texts.foreach { tx =>
        val m = p.matcher(tx)
        while (m.find()) {
          val syms = symbolize(m.group())
          words(syms) = words.getOrElse(syms, 0L) + 1L
        }
      }
      var cur = words.toList
      val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String)]
      var rank = 1
      var done = false
      while (rank <= numMerges && !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        cur.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach(pr => pairs(pr) = pairs.getOrElse(pr, 0L) + c)
        }
        if (pairs.isEmpty) done = true
        else {
          val ((l, r), _) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((rank, l, r))
          def mergeWord(syms: List[String]): List[String] = syms match {
            case a :: b :: rest if a == l && b == r => (l + r) :: mergeWord(rest)
            case a :: rest                          => a :: mergeWord(rest)
            case Nil                                => Nil
          }
          cur = cur.map { case (syms, c) => (mergeWord(syms), c) }
            .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }.toList
          rank += 1
        }
      }
      out.toList
    }
    val vocab = Vector("the", "cat", "sat", "mat", "on", "a", "café", "naïve", "42", "it's")
    (0 until 3).foreach { i =>
      val rnd   = new scala.util.Random(9090 + i)
      val texts = List.fill(30)(List.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = Bpe
        .trainBytes(texts.zipWithIndex.map { case (tx, j) => (j.toLong, tx) }.toDF("doc_id", "text"),
          col("text"), numMerges = 12)
        .select("rank", "left", "right").as[(Int, String, String)]
        .collect().sortBy(_._1).toList
      assert(got === reference(texts, 12), s"seed ${9090 + i}")
    }
  }
}
