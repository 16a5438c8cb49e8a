package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Scratch {
  // stage-level profile of the LONG-KEYED setSimJoin pipeline on a
  // fuzz corpus: stage walls + candidate/match volumes for the round
  // artifacts
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/tmp/graft_fuzz_x30")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.3f s => $r"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val (tauNum, tauDen) = (1, 2)
    import graft.queries.TextOps.shingleArray
    def toks(c: org.apache.spark.sql.Column) = split(c, " ")
    val hashed = docs.select(col("doc_id"), col("text"), md5(col("text")).as("h"))
    val withRep = hashed.withColumn("rid",
      min(col("doc_id")).over(Window.partitionBy("h")))
    val members = withRep.select(col("rid"), col("doc_id"))
    val reps = withRep.where(col("doc_id") === col("rid")).select(col("rid"), col("text"))
    val d = time("1 shingle+checkpoint") {
      val dd = reps.select(col("rid"), toks(col("text")).as("w"))
        .select(col("rid"), shingleArray(col("w"), 3).as("ts")).localCheckpoint(true)
      dd.count(); dd
    }
    val tok = d.select(col("rid"), explode(col("ts")).as("tok"))
    val freq = time("2 freq+tid checkpoint") {
      val f = tok.groupBy("tok").agg(count(lit(1)).as("f"))
        .withColumn("tid", monotonically_increasing_id()).localCheckpoint(true)
      f.count(); f
    }
    val tokId = tok.join(freq, "tok")
    val setsInt = time("3 int sets checkpoint") {
      val s = d.select(col("rid"))
        .join(tokId.groupBy("rid").agg(collect_list(col("tid")).as("tsi")), Seq("rid"), "left")
        .select(col("rid"), coalesce(col("tsi"), array().cast("array<bigint>")).as("tsi"))
        .withColumn("sz", size(col("tsi")).cast("long"))
        .localCheckpoint(true)
      s.count(); s
    }
    val probe = time("4 probe")(
      setsInt.agg(count(lit(1)), sum(col("sz")), min(col("sz"))).head())
    println(s"rows=${probe.getLong(0)} elems=${probe.getLong(1)} minSz=${probe.getLong(2)}")
    val minSz = math.max(1L, probe.getLong(2))
    val oMinProbe = expr(
      s"($tauNum * (n + greatest(($tauNum * n + $tauDen - 1) div $tauDen, ${minSz}L))" +
        s" + $tauNum + $tauDen - 1) div ${tauNum + tauDen}")
    val oMinIdx = expr(s"(2 * $tauNum * n + $tauNum + $tauDen - 1) div ${tauNum + tauDen}")
    val ranked = tokId
      .withColumn("rn", row_number().over(Window.partitionBy("rid").orderBy(col("f"), col("tok"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("rid")))
    val prefix = time("5 prefix rank+checkpoint") {
      val p = ranked.where(col("rn") <= col("n") - oMinProbe + 1)
        .withColumn("in_idx", col("rn") <= col("n") - oMinIdx + 1)
        .select(col("rid"), col("tid"), col("rn"), col("n"), col("in_idx"))
        .localCheckpoint(true)
      p.count(); p
    }
    println(s"prefix rows=${prefix.count()} idx rows=${prefix.where(col("in_idx")).count()}")
    val matches = prefix.as("pa").join(
      prefix.where(col("in_idx")).as("pb"),
      col("pa.tid") === col("pb.tid") &&
        (col("pa.n") > col("pb.n") ||
          (col("pa.n") === col("pb.n") && col("pa.rid") > col("pb.rid"))) &&
        (lit(1) + least(col("pa.n") - col("pa.rn"), col("pb.n") - col("pb.rn"))) *
          (tauNum + tauDen) >= (col("pa.n") + col("pb.n")) * tauNum)
      .select(col("pa.rid").as("ra"), col("pb.rid").as("rb"))
    time("6 match-rows count")(matches.count())
    def verified(cands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = cands
      .join(broadcast(setsInt.select(col("rid").as("ra"), col("tsi").as("set_a"), col("sz").as("sa"))), "ra")
      .join(broadcast(setsInt.select(col("rid").as("rb"), col("tsi").as("set_b"), col("sz").as("sb"))), "rb")
      .where(least(col("sa"), col("sb")) * (tauNum + tauDen) >= (col("sa") + col("sb")) * tauNum)
      .select(col("ra"), col("rb"),
        size(array_intersect(col("set_a"), col("set_b"))).cast("long").as("inter"),
        col("sa"), col("sb"))
      .where(col("inter") * (tauNum + tauDen) >= (col("sa") + col("sb")) * tauNum)
    val repPairs = time("7 verify per-match + dedup count") {
      val r = verified(matches).distinct().localCheckpoint(true); r.count()
      r
    }
    val cross = repPairs
      .join(members.select(col("rid").as("ra"), col("doc_id").as("ida")), "ra")
      .join(members.select(col("rid").as("rb"), col("doc_id").as("idb")), "rb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"))
    time("8 expansion+sort count")(cross.orderBy("doc_a", "doc_b").count())
    spark.stop()
  }
}

object ScratchQ114 {
  // stage-level profile of the CURRENT fuzzyDecon shape (round-6
  // window-over-hash collapse) on a fuzz corpus: per-stage walls plus
  // the volume counters that explain a super-linear x30/x10 ratio
  // (rep counts, band-key cardinality, candidate pairs)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/tmp/graft_fuzz_x30")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.3f s => $r"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.queries.TextOps.shingleArray
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val evalPred = col("doc_id") % 10 === 0
    val nHashes = 8
    val flagged = docs
      .select(col("doc_id"), evalPred.as("is_eval"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("is_eval"), shingleArray(col("toks"), 3).as("gs"))
    val withRep = time("1 collapse window over gh") {
      val r = flagged
        // visible escape of the same U+0001 byte production uses
        // (TextOps.fuzzyDecon) — a literal byte here was misread as ""
        // in two successive reviews
        .withColumn("gh", md5(concat_ws("\u0001", col("gs"))))
        .withColumn("rep_id", min(col("doc_id")).over(
          Window.partitionBy(col("is_eval"), col("gh")))).localCheckpoint(true)
      r.count(); r
    }
    val members = withRep.select(col("is_eval"), col("doc_id"), col("rep_id"))
    val withSets = withRep.where(col("doc_id") === col("rep_id"))
      .select(col("is_eval"), col("doc_id"), col("gs"))
    println(s"docs=${members.count()} reps=${withSets.count()} " +
      s"evalReps=${withSets.where(col("is_eval")).count()}")
    val mhCols = (0 until nHashes).map(h =>
      min(md5(concat(lit(s"$h|"), col("g")))).as(s"mh$h"))
    val sigs = time("3 minhash sigs") {
      val s0 = withSets
        .select(col("doc_id"), col("is_eval"), explode_outer(col("gs")).as("g"))
        .groupBy("doc_id", "is_eval").agg(mhCols.head, mhCols.tail: _*)
        .localCheckpoint(true)
      s0.count(); s0
    }
    val bands = sigs.select(col("doc_id"), col("is_eval"),
      explode(array((0 until nHashes / 2).map(b =>
        struct(lit(b).as("band"),
          concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("band_key"))): _*)).as("bk"))
      .select(col("doc_id"), col("is_eval"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    println(s"distinct band keys=${bands.select("band", "band_key").distinct().count()} " +
      s"evalBandRows=${bands.where(col("is_eval")).count()}")
    val evalBands = bands.where(col("is_eval"))
      .select(col("doc_id").as("eval_rep"), col("band"), col("band_key"))
    val cands = time("4 band join + distinct") {
      val c = bands.where(!col("is_eval"))
        .select(col("doc_id").as("train_rep"), col("band"), col("band_key"))
        .join(broadcast(evalBands), Seq("band", "band_key"))
        .select("train_rep", "eval_rep").distinct().localCheckpoint(true)
      c.count(); c
    }
    println(s"cands=${cands.count()}")
    val trainSets = withSets.where(!col("is_eval"))
      .select(col("doc_id").as("train_rep"), col("gs").as("set_a"))
    val evalSets = withSets.where(col("is_eval"))
      .select(col("doc_id").as("eval_rep"), col("gs").as("set_b"))
    val repPairs = time("5 verify intersect (current |A|+|B|-inter shape)") {
      val r = cands.join(trainSets, "train_rep").join(broadcast(evalSets), "eval_rep")
        .select(col("train_rep"), col("eval_rep"),
          size(array_intersect(col("set_a"), col("set_b"))).cast("long").as("n_inter"),
          (size(col("set_a")) + size(col("set_b"))).cast("long").as("n_ab"))
        .select(col("train_rep"), col("eval_rep"), col("n_inter"),
          (col("n_ab") - col("n_inter")).as("n_union"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / col("n_union").cast("double"))
        .where(col("jaccard") >= 0.5).localCheckpoint(true)
      r.count(); r
    }
    time("6 member expansion + sort") {
      repPairs
        .join(members.where(!col("is_eval"))
          .select(col("doc_id").as("train_doc"), col("rep_id").as("train_rep")), "train_rep")
        .join(members.where(col("is_eval"))
          .select(col("doc_id").as("eval_doc"), col("rep_id").as("eval_rep")), "eval_rep")
        .select(col("train_doc"), col("eval_doc"), col("jaccard"))
        .orderBy("train_doc", "eval_doc").count()
    }
    spark.stop()
  }
}

object ScratchQ44Brute {
  // measure: blocked exact all-pairs cosine sweep over the fuzz-x30
  // embeddings vs the banded candidate pipeline it would replace
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/tmp/graft_fuzz_x30")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.3f s => $r"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.spark.CosSimExpr.register(spark)
    val reps = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint(true)
    println(s"n=${reps.count()}")
    time("brute BNLJ broadcast sweep") {
      reps.join(broadcast(reps.select(col("vec_id").as("rb"), col("v").as("vb"))),
          col("vec_id") < col("rb"))
        .select(col("vec_id").as("ra"), col("rb"),
          call_function("dlx_cos4", col("v"), col("vb")).as("cos_sim"))
        .where(col("cos_sim") >= 0.30)
        .count()
    }
    spark.stop()
  }
}
