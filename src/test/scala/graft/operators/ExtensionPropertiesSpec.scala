package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based coverage of the round-5 kernels, same fixed-seed plain
  * ScalaCheck style as CoercionPropertiesSpec (no scalatest bridge in the
  * offline cache): PNG codec round-trip over arbitrary images, PQ code
  * validity over arbitrary vectors, split totality/stability over
  * arbitrary ids and weights.
  */
class ExtensionPropertiesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("PNG codec property: encode→decode is the identity for arbitrary pixels/dims") {
    val imgGen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (w, h, seed)
    sample(imgGen, 60).foreach { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt() & 0xFFFFFF)
      val Some((dw, dh, dpx)) =
        Multimodal.decodePngFast(Multimodal.encodePng(px, w, h))
      assert(dw == w && dh == h, s"dims $w x $h")
      assert(dpx.sameElements(px), s"pixels $w x $h seed=$seed")
    }
  }

  test("pq_encode property: codes always in [0, k) for arbitrary vectors and shapes") {
    val caseGen = for {
      m <- Gen.oneOf(1, 2, 4, 8)
      k <- Gen.oneOf(1, 2, 16)
      subDim <- Gen.choose(1, 4)
      nVec <- Gen.choose(1, 6)
    } yield (m, k, subDim, nVec)
    sample(caseGen, 40).zipWithIndex.foreach { case ((m, k, subDim, nVec), i) =>
      val rnd = new scala.util.Random(1000L + i)
      val codebooks = Array.fill(m * k)(Array.fill(subDim)(rnd.nextDouble() * 2 - 1))
      val vecs = Seq.fill(nVec)(Array.fill(m * subDim)(rnd.nextFloat() * 2 - 1))
      val out = vecs.toDF("v").select(
        graft.functions.TextVectorExpressions.pq_encode(col("v"), codebooks, m, k)
          .as("codes")).collect()
      out.foreach { r =>
        val codes = r.getSeq[Int](0)
        assert(codes.length == m)
        assert(codes.forall(c => c >= 0 && c < k), s"m=$m k=$k codes=$codes")
      }
    }
  }

  test("repetition_stats property: fractions in [0,1], deterministic, self-concat monotone") {
    val textGen = for {
      nLines <- Gen.choose(0, 6)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (nLines, seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "", "  ", "tok.en")
    sample(textGen, 50).foreach { case (nLines, seed) =>
      val rnd = new scala.util.Random(seed)
      val text = Seq.fill(nLines)(
        Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
        .mkString("\n")
      def stats(t: String): Seq[Double] =
        Seq(t).toDF("text")
          .select(graft.operators.TextOps.repetitionStats(col("text")).as("r"))
          .select("r.dup_line_frac", "r.dup_line_char_frac",
            "r.top_2gram_char_frac", "r.dup_5gram_char_frac")
          .collect().head.toSeq.map(_.asInstanceOf[Double])
      val s1 = stats(text)
      assert(s1.forall(v => v >= 0.0 && v <= 1.0), s"$s1 for <$text>")
      assert(stats(text) == s1, "deterministic")
      // a doc concatenated with itself can only get MORE repetitive: every
      // line duplicates, and (when the doc has >=5 tokens) every 5-gram of
      // the original now occurs at least twice
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 5 && text.trim.nonEmpty) {
        val s2 = stats(text + "\n" + text)
        assert(s2(0) >= s1(0) - 1e-12, s"dup_line_frac $s1 -> $s2")
        assert(s2(3) >= s1(3) - 1e-12, s"dup_5gram $s1 -> $s2")
        assert(s2(3) > 0.9, s"self-concat 5-gram coverage should be ~1: $s2")
      }
    }
  }

  test("splitAssign property: total, deterministic, and weight-consistent for arbitrary weights") {
    val weightsGen = for {
      a <- Gen.choose(1, 98)
      b <- Gen.choose(1, 99 - a)
    } yield Seq(("train", a / 100.0), ("val", b / 100.0), ("test", (100 - a - b) / 100.0))
    sample(weightsGen, 20).foreach { weights =>
      val ids = (0L until 1000L).toDF("id")
      val out = ids.select(TextOps.splitAssign(col("id"), weights).as("s"))
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // total: every id lands in exactly one declared split
      assert(out.values.sum == 1000L, s"$weights -> $out")
      assert(out.keySet.subsetOf(weights.map(_._1).toSet))
      // weight-consistent within a generous tolerance (hash is uniform-ish,
      // 1000 samples): each observed share within 12 points of its weight
      weights.foreach { case (name, wt) =>
        val got = out.getOrElse(name, 0L) / 1000.0
        assert(math.abs(got - wt) < 0.12, f"$name want=$wt%.2f got=$got%.2f")
      }
    }
  }

  test("hashed_bow_margins property: class c of the matrix kernel == the binary kernel on row c") {
    // the multi-class kernel must be EXACTLY per-class applications of
    // the binary kernel (features hashed once and reused is an
    // optimization, never a semantic change)
    val caseGen = for {
      nC <- Gen.choose(2, 5)
      dim <- Gen.oneOf(8, 64, 256)
      nWords <- Gen.choose(0, 12)
    } yield (nC, dim, nWords)
    sample(caseGen, 30).zipWithIndex.foreach { case ((nC, dim, nWords), i) =>
      val rnd = new scala.util.Random(7000L + i)
      val text = Seq.fill(nWords)(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(" ")
      val w = Array.fill(nC)(Array.fill(dim)(rnd.nextDouble() * 4 - 2))
      val multi = Seq(text).toDF("t").select(
        graft.functions.TextVectorExpressions
          .hashed_bow_margins(col("t"), w).as("m"))
        .head().getSeq[Double](0)
      assert(multi.size == nC)
      (0 until nC).foreach { c =>
        val single = Seq(text).toDF("t").select(
          graft.functions.TextVectorExpressions
            .hashed_bow_margin(col("t"), w(c)).as("m"))
          .head().getDouble(0)
        assert(multi(c) == single,
          s"class $c: matrix=${multi(c)} binary=$single dim=$dim text='$text'")
      }
    }
  }

  test("wordpiece_encode property: every non-UNK encoding glues back to the word exactly") {
    // vocab = random pieces + guaranteed per-char fallbacks for half the
    // alphabet: words over covered chars must round-trip, words touching
    // uncovered chars must degrade to [UNK] — never a silently wrong
    // segmentation
    val covered = "abcdefghijklm"
    val caseGen = for {
      nPieces <- Gen.choose(0, 20)
      nWords <- Gen.choose(1, 10)
    } yield (nPieces, nWords)
    sample(caseGen, 30).zipWithIndex.foreach { case ((nPieces, nWords), i) =>
      val rnd = new scala.util.Random(9000L + i)
      def piece(len: Int) =
        Seq.fill(len)(covered(rnd.nextInt(covered.length))).mkString
      val vocab = (covered.map(_.toString) ++ covered.map("##" + _) ++
        Seq.fill(nPieces) {
          val p = piece(2 + rnd.nextInt(4))
          if (rnd.nextBoolean()) p else "##" + p
        }).distinct.toArray
      val words = Seq.fill(nWords) {
        val onAlphabet = rnd.nextInt(4) > 0
        val letters = if (onAlphabet) covered else "abcdefghijklmnopqrstuvwxyz"
        Seq.fill(1 + rnd.nextInt(10))(letters(rnd.nextInt(letters.length))).mkString
      }
      val out = words.toDF("w").select(col("w"),
        graft.functions.TextVectorExpressions
          .wordpiece_encode(col("w"), vocab).as("p"))
        .collect().map(r => (r.getString(0), r.getSeq[String](1)))
      out.foreach { case (word, pieces) =>
        if (pieces == Seq("[UNK]")) {
          // only legal when some char is genuinely uncovered
          assert(word.exists(c => !covered.contains(c)),
            s"'$word' went UNK despite full char coverage (vocab=${vocab.toSeq})")
        } else {
          val glued = pieces.map(_.stripPrefix("##")).mkString
          assert(glued == word, s"glue mismatch: '$word' -> $pieces")
          // continuation discipline: first piece bare, rest ##-prefixed
          assert(!pieces.head.startsWith("##"), pieces.toString)
          assert(pieces.tail.forall(_.startsWith("##")), pieces.toString)
        }
      }
    }
  }

  test("count-min property: est >= true for arbitrary item multisets at any shape") {
    val caseGen = for {
      depth <- Gen.choose(1, 5)
      width <- Gen.oneOf(2, 8, 64)
      nItems <- Gen.choose(1, 200)
      alphabet <- Gen.choose(1, 30)
    } yield (depth, width, nItems, alphabet)
    sample(caseGen, 25).zipWithIndex.foreach { case ((d, w, n, a), i) =>
      val rnd = new scala.util.Random(11000L + i)
      val items = Seq.fill(n)(s"it${rnd.nextInt(a)}")
      val df = items.toDF("item")
      val sketch = Skew.countMin(df, "item", depth = d, width = w)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = Skew.countMinEstimate(sketch, truth.keys.toSeq.toDF("item"), "item")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (item, t) =>
        assert(est(item) >= t,
          s"UNDER-estimate: $item true=$t est=${est(item)} d=$d w=$w")
      }
      // total mass conservation per sketch row: sum of any row's cells == n
      val rows = sketch.cells.groupBy("r").agg(sum("n")).collect()
        .map(r => r.getLong(1))
      assert(rows.length == d && rows.forall(_ == n.toLong),
        s"row mass != $n: ${rows.toSeq}")
    }
  }

  test("merge_fold kernel property: bit-parity with the Catalyst-HOF fold, both fusion modes") {
    // the round-11 HOF form both trainers used, kept here verbatim as
    // the independent reference the codegen'd kernel must equal
    def hofFold(syms: org.apache.spark.sql.Column,
        pairs: Seq[(String, String)], wp: Boolean): org.apache.spark.sql.Column = {
      val sep = "\u0000"
      val keys = pairs.map { case (l, r) => l + sep + r }
      aggregate(syms, typedLit(Seq.empty[String]), (acc, x) => {
        val last = element_at(acc, -1)
        val hit = (size(acc) > lit(0)) &&
          concat(last, lit(sep), x).isin(keys: _*)
        val fused = if (wp) concat(last, substring(x, 3, Int.MaxValue))
          else concat(last, x)
        when(hit, concat(slice(acc, lit(1), size(acc) - 1), array(fused)))
          .otherwise(concat(acc, array(x)))
      })
    }
    val alphabet = Seq("a", "b", "c", "ab", "bc", "abc")
    val caseGen = for {
      wp <- Gen.oneOf(false, true)
      nSyms <- Gen.choose(0, 12)
      symIdx <- Gen.listOfN(nSyms, Gen.choose(0, alphabet.length - 1))
      nPairs <- Gen.choose(1, 4)
      pairIdx <- Gen.listOfN(nPairs,
        Gen.zip(Gen.choose(0, alphabet.length - 1), Gen.choose(0, alphabet.length - 1)))
    } yield (wp, symIdx, pairIdx)
    sample(caseGen, 60).zipWithIndex.foreach { case ((wp, symIdx, pairIdx), i) =>
      // wordpiece mode: non-initial symbols and pair rights carry "##"
      // (the training invariant the kernel's unconditional strip assumes)
      val syms = symIdx.zipWithIndex.map { case (s, j) =>
        if (wp && j > 0) "##" + alphabet(s) else alphabet(s)
      }
      val pairs = pairIdx.map { case (l, r) =>
        (if (wp && (l + r) % 2 == 0) "##" + alphabet(l)
         else alphabet(l)) -> (if (wp) "##" + alphabet(r) else alphabet(r))
      }.distinct
      val df = Seq(Tuple1(syms)).toDF("syms")
      val viaKernel = df.select(graft.functions.TextVectorExpressions
        .merge_fold(col("syms"), pairs, wp).as("o")).head().getSeq[String](0)
      val viaHof = df.select(hofFold(col("syms"), pairs, wp).as("o"))
        .head().getSeq[String](0)
      assert(viaKernel == viaHof,
        s"case $i wp=$wp syms=$syms pairs=$pairs kernel=$viaKernel hof=$viaHof")
    }
  }

  test("lineDedup property: equals the naive distinct-doc line-count filter on arbitrary corpora") {
    // line pool: shared lines (can cross the bar), blanks (exempt), and
    // per-doc unique lines (never heavy)
    val caseGen = for {
      nDocs <- Gen.choose(1, 9)
      minDocs <- Gen.choose(2, 4)
      docs <- Gen.listOfN(nDocs, Gen.listOfN(6, Gen.choose(0, 9)))
    } yield (minDocs, docs)
    sample(caseGen, 15).zipWithIndex.foreach { case ((minDocs, picks), ci) =>
      val texts = picks.zipWithIndex.map { case (ps, d) =>
        d.toLong -> ps.zipWithIndex.map {
          case (p, j) if p < 5 => s"shared line $p"
          case (p, _) if p < 7 => if (p == 5) "" else "   "
          case (_, j) => s"unique $d-$j"
        }.mkString("\n")
      }
      // reference: split keeping trailing empties (Spark's split limit -1)
      val lineSets = texts.map { case (d, t) => d -> t.split("\n", -1).toSeq }
      val heavy = lineSets.flatMap { case (d, ls) => ls.distinct.map(d -> _) }
        .filter(_._2.trim.nonEmpty)
        .groupBy(_._2).collect { case (l, ds) if ds.map(_._1).distinct.size >= minDocs => l }
        .toSet
      val expected = lineSets.map { case (d, ls) =>
        val kept = ls.filterNot(heavy)
        d -> ((ls.size.toLong, kept.size.toLong, kept.mkString("\n")))
      }.toMap
      val got = TextOps.lineDedup(texts.toDF("doc_id", "text"),
          "doc_id", "text", minDocs = minDocs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expected, s"case $ci minDocs=$minDocs texts=$texts")
    }
  }

  test("bloom property: is_new equals exact membership, zero false negatives, any keys/shape") {
    val caseGen = for {
      nSeen <- Gen.choose(0, 50)
      seenIdx <- Gen.listOfN(nSeen, Gen.choose(0, 25))
      nInc <- Gen.choose(0, 30)
      incIdx <- Gen.listOfN(nInc, Gen.choose(0, 50)) // overlaps seen pool below 26
      mBits <- Gen.oneOf(64L, 256L, 1L << 16)
      k <- Gen.oneOf(1, 3, 8)
    } yield (seenIdx, incIdx, mBits, k)
    sample(caseGen, 12).zipWithIndex.foreach { case ((seenIdx, incIdx, m, k), ci) =>
      val seenKeys = seenIdx.map(i => s"key$i")
      val inc = incIdx.zipWithIndex.map { case (x, id) => (id.toLong, s"key$x") }
      val out = Skew.bloomNewIds(
          seenKeys.map(Tuple1(_)).toDF("text"),
          inc.toDF("id", "text"), "id", "text", mBits = m, k = k)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
      val seenSet = seenKeys.toSet
      assert(out.size == inc.size, s"case $ci")
      inc.foreach { case (id, key) =>
        val (_, maybe, isNew) = out(id)
        assert(isNew == !seenSet.contains(key),
          s"case $ci m=$m k=$k id=$id key=$key: is_new=$isNew")
        // the no-false-negative contract, at any FP density
        if (seenSet.contains(key))
          assert(maybe, s"case $ci m=$m k=$k: false negative on $key")
      }
    }
  }

  test("avgRound4 property: equals exact-rational HALF_UP for arbitrary sums/counts, midpoints included") {
    // the cross-engine seam this helper exists for: sum/count landing
    // EXACTLY on a 4-decimal midpoint (no double represents it, so any
    // round(double, 4) picks a side by float luck). Half the cases are
    // CONSTRUCTED midpoints: s = n·(m + 1/20000) in micro units.
    val caseGen = for {
      n <- Gen.choose(1L, 5000L)
      mid <- Gen.oneOf(true, false)
      sMicro <- if (mid) Gen.choose(-300000L, 300000L).map(m => n * (m * 100 + 50))
        else Gen.choose(-30000000000L, 30000000000L)
    } yield (sMicro, n)
    val cases = sample(caseGen, 400).zipWithIndex
      .map { case ((s, n), i) => (i.toLong, new java.math.BigDecimal(s)
        .movePointLeft(6), n) }
    val df = cases.toDF("case_id", "s", "n")
      .select(col("case_id"),
        col("s").cast(org.apache.spark.sql.types.DecimalType(28, 6)).as("s"),
        col("n"))
    val got = df.select(col("case_id"),
        Terms.avgRound4(col("s"), col("n")).as("avg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, s, n) =>
      // exact rational HALF_UP at 4 decimals, away from zero
      val expect = s.divide(new java.math.BigDecimal(n), 4,
        java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
      assert(got(id) == expect,
        s"case $id: s=$s n=$n got=${got(id)} expect=$expect")
    }
  }

  test("misra-gries property: bound + containment for arbitrary streams, k, partitioning") {
    val caseGen = for {
      k <- Gen.choose(2, 40)
      parts <- Gen.choose(1, 16)
      nKeys <- Gen.choose(1, 60)
      rows <- Gen.choose(50, 2000)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (k, parts, nKeys, rows, seed)
    sample(caseGen, 15).zipWithIndex.foreach {
      case ((k, parts, nKeys, rows, seed), ci) =>
        val rnd = new scala.util.Random(seed)
        // Zipf-ish: key j drawn with weight ~ 1/(j+1)
        val weights = (0 until nKeys).map(j => 1.0 / (j + 1))
        val total = weights.sum
        val items = Seq.fill(rows) {
          var u = rnd.nextDouble() * total
          var j = 0
          while (u > weights(j) && j < nKeys - 1) { u -= weights(j); j += 1 }
          s"k$j"
        }
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val df = items.toDF("item").repartition(parts)
        val hh = Skew.heavyHitters(df, "item", k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val bound = rows.toLong / (k + 1)
        assert(hh.size <= k, s"case $ci: ${hh.size} > k=$k")
        hh.foreach { case (item, est) =>
          val t = truth(item)
          assert(est <= t && t <= est + bound,
            s"case $ci k=$k parts=$parts: $item est=$est true=$t bound=$bound")
        }
        truth.foreach { case (item, t) =>
          if (t > bound)
            assert(hh.contains(item),
              s"case $ci k=$k parts=$parts: guaranteed $item (n=$t > $bound) missing")
        }
    }
  }
}
