package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** ScalaCheck properties for the curation operators: for ANY corpus —
  *   1. chunking reconstructs every document exactly (stride-advanced
  *      windows cover all tokens; de-overlapped concat = original);
  *   2. every chunk except a short tail carries chunkSize tokens;
  *   3. stratified sampling is a subset, is deterministic, and respects
  *      the per-stratum bucket bound;
  *   4. tf-idf emits ≤ k rows per doc with rnk a prefix 1..m and scores
  *      non-increasing in rank order.
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 150)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "the", "of"))
  } yield ws.mkString(" ")

  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(Gen.listOfN(_, genDoc))

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunking covers every token exactly; full windows except the tail") {
    val C = 16
    val S = 12
    check(Prop.forAll(genCorpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = Curation.chunkTokens(docs, C, S).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val cs = chunks.getOrElse(i.toLong, Array.empty)
        if (toks.isEmpty) cs.isEmpty
        else {
          // de-overlap: first chunk whole, then drop the C-S overlap
          val rebuilt = cs.zipWithIndex.flatMap { case ((_, _, _, txt), j) =>
            val ws = txt.split(" ")
            if (j == 0) ws else ws.drop(C - S)
          }
          val fullWindows = cs.dropRight(1).forall(_._3 == C)
          rebuilt.sameElements(toks) && fullWindows &&
            cs.head._2 == 0L && cs.map(_._2).sameElements(cs.indices.map(_.toLong))
        }
      }
    })
  }

  test("stratified sample: subset, deterministic, bucket-bounded") {
    check(Prop.forAll(genCorpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val stratum = TextAnalysis.langId(col("text"))
      def run() = Curation.stratifiedSample(docs, stratum, Map("en" -> 60), 30)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val a = run()
      val b = run()
      a.sortBy(_._1).sameElements(b.sortBy(_._1)) &&
        a.forall { case (id, s, bucket) =>
          id >= 0 && id < texts.size &&
            bucket < (if (s == "en") 60 else 30)
        }
    })
  }

  test("tf-idf: ≤ k rows per doc, rnk prefix, scores non-increasing") {
    val k = 3
    check(Prop.forAll(genCorpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val byDoc = Curation.tfidfTopTerms(docs, k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4)))
        .groupBy(_._1)
      byDoc.values.forall { rows =>
        val sorted = rows.sortBy(_._4)
        sorted.length <= k &&
          sorted.map(_._4).sameElements((1 to sorted.length).map(_.toLong)) &&
          sorted.sliding(2).forall {
            case Array(hi, lo) => hi._3 >= lo._3 || (hi._3 == lo._3 && hi._2 <= lo._2)
            case _ => true
          }
      }
    })
  }

  test("packing: every non-empty doc lands exactly once, offsets under budget, per-bucket token conservation") {
    val B = 16
    check(Prop.forAll(genCorpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nonEmpty = texts.count(_.split("\\s+").exists(_.nonEmpty))
      val out = Curation.packSequences(docs, budgetTokens = B, buckets = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      out.length == nonEmpty &&
        out.map(_._1).distinct.length == nonEmpty &&
        out.forall { case (_, _, _, _, off) => off >= 0 && off < B } &&
        // within a bucket, offsets tile the token stream: Σ tokens equals
        // the max (seq_id·B + offset + tokens) — no gaps, no overlaps
        out.groupBy(_._2).values.forall { rows =>
          val total = rows.map(_._3).sum
          val end = rows.map { case (_, _, t, s, o) => s * B + o + t }.max
          total == end
        }
    })
  }

  test("rrf fusion: list-order invariant, scores exactly reproducible, ranks total") {
    // arbitrary per-query ranked lists (rank 1..m per list, distinct docs)
    val genList: Gen[List[(Long, Long, Long)]] = for {
      q <- Gen.choose(0L, 1L)
      m <- Gen.choose(1, 8)
      ds <- Gen.pick(m, 0L to 20L)
    } yield ds.toList.zipWithIndex.map { case (d, i) => (q, d, i + 1L) }
    val genLists: Gen[List[List[(Long, Long, Long)]]] =
      Gen.choose(1, 3).flatMap(Gen.listOfN(_, genList))
    check(Prop.forAll(genLists) { lists =>
      val dfs = lists.map(_.toDF("query_id", "doc_id", "rnk"))
      val out = Curation.rrfFuse(dfs, k = 100).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
      val reversed = Curation.rrfFuse(dfs.reverse, k = 100).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
      // reference scores: integer floor sums over the contributing lists
      val expected = lists.flatten.groupBy(t => (t._1, t._2)).map {
        case (key, rows) =>
          key -> (rows.map(t => 1000000L / (60L + t._3)).sum.toDouble / 1e6,
            rows.size.toLong)
      }
      out == reversed &&
        out.forall { case (key, (score, nLists, _)) =>
          expected(key) == ((score, nLists)) } &&
        // per query, ranks form a 1..n prefix (total order, no gaps)
        out.keys.groupBy(_._1).forall { case (q, keys) =>
          val rnks = keys.map(k => out(k)._3).toSeq.sorted
          rnks == (1L to rnks.size.toLong)
        }
    })
  }

  test("decontamination: overlap counts are monotone in the eval set") {
    check(Prop.forAll(genCorpus, genCorpus) { (train, evalA) =>
      val docs = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val evalSmall = evalA.take(math.max(1, evalA.length / 2))
        .zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val evalBig = evalA.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      def hits(ev: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        Decontamination.overlapStats(docs, ev).collect()
          .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val small = hits(evalSmall)
      val big = hits(evalBig)
      // a superset eval set can only flag more (or equally many) grams
      small.forall { case (id, n) => big(id) >= n }
    })
  }

  test("dsir: physical-layout invariance and gram conservation") {
    check(Prop.forAll(genCorpus) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, i % 3 == 0) }
        .toDF("doc_id", "text", "is_t")
      def run(df: org.apache.spark.sql.DataFrame) =
        Curation.dsirWeights(df, col("is_t"), buckets = 32).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      val a = run(docs)
      val b = run(docs.repartition(7)) // same answer on any layout
      val totalGrams =
        texts.map(_.split("\\s+").count(_.nonEmpty).toLong).sum
      a == b && a.toSeq.map(_._2).sum == totalGrams
    })
  }

  test("shard assignment: exactly-once cover, shard counts within one") {
    check(Prop.forAll(genCorpus, Gen.choose(1, 5)) { (texts, n) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t.length.toLong) }
        .toDF("doc_id", "n_chars")
      val r = Curation.shardAssign(docs, n).collect()
        .map(x => (x.getLong(0), x.getLong(2)))
      val counts = (0L until n.toLong)
        .map(s => r.count(_._2 == s)).sorted
      r.map(_._1).toSet.size == texts.size &&
        r.forall(x => x._2 >= 0 && x._2 < n) &&
        counts.last - counts.head <= 1
    })
  }

  test("k-anonymity: classes partition the corpus; flag ⇔ size < k") {
    check(Prop.forAll(genCorpus, Gen.choose(1, 4)) { (texts, k) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (s"l${i % 2}", s"s${t.length % 3}") }
        .toDF("lang", "source")
      val r = Curation.kAnonymity(docs, Seq("lang", "source"), k.toLong)
        .collect().map(x => (x.getLong(2), x.getLong(3)))
      r.map(_._1).sum == texts.size &&
        r.forall { case (sz, v) => (v == 1L) == (sz < k) }
    })
  }
}
