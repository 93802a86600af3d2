package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators a training-data pipeline runs between crawl
  * and tokenization: character-level near-dup detection (edit distance —
  * the granularity MinHash/SimHash token shingles cannot see), PII
  * detection + redaction, and per-host boilerplate-line removal (the
  * trafilatura/CCNet "same footer on every page of the site" signal).
  *
  * All three are planted-fixture oracled: the corpus augmentation (typo
  * twins, planted PII, appended footers) is arithmetic on (doc_id, text,
  * source), so the DuckDB oracle rebuilds the identical corpus from the
  * same parquet and a parser/regex bug cannot hash-match by accident.
  */
object CleanOps {

  // ======================================== edit-distance near-dup ===

  /** Twin ids live above this offset; base docs stay below it. */
  val EditTwinOffset = 1000000L

  /** Max edits for [[editNearDups]] — segments = K+1 by pigeonhole. */
  val EditMaxK = 2

  /** The documents corpus plus a SUBSTITUTION TWIN per doc: two characters
    * (positions derived from doc_id and the doc's own length, provably
    * distinct for len ≥ 2) overwritten with '~' (absent from the corpus
    * alphabet), so every twin sits at Hamming — and, lengths equal,
    * Levenshtein — distance exactly 2 from its base.
    */
  def editTwinCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = TrainingOps.docs(spark, sfDir).select("doc_id", "text")
    val twins = base
      .withColumn("p1", expr("(doc_id % length(text)) + 1"))
      .withColumn("p2",
        expr("((doc_id + (length(text) div 2)) % length(text)) + 1"))
      .withColumn("lo", least(col("p1"), col("p2")))
      .withColumn("hi", greatest(col("p1"), col("p2")))
      .select(
        (col("doc_id") + EditTwinOffset).as("doc_id"),
        expr("concat(substring(text, 1, lo - 1), '~', " +
          "substring(text, lo + 1, hi - lo - 1), '~', " +
          "substring(text, hi + 1))").as("text"))
    base.unionByName(twins)
  }

  /** Edit-distance near-dup pairs over [[editTwinCorpus]] (oracled as
    * q_doc_edit_dups) — the PassJoin/PartEnum blocking family: each text
    * splits into K+1 = 3 contiguous segments (even split from its OWN
    * length); by pigeonhole, two equal-length strings within Hamming
    * distance K share at least one aligned segment, so candidates come
    * from a self-join on (seg_idx, segment) — never an all-pairs product
    * — and the exact `levenshtein` verify runs on candidates only.
    *
    * Declared reach (disclosed, the IVF-recall discipline): blocking is
    * the SUBSTITUTION model — an insert/delete twin shifts every later
    * character and needs PassJoin's shifted-segment probes, which this
    * operator does not take (document twins here are substitution-planted,
    * and crawl-dedup near-twins — re-encodes, tracking-param noise — are
    * overwhelmingly length-preserving). The verify is full Levenshtein,
    * so any pair the blocking DOES surface is scored exactly.
    *
    * Scale shape (100 TB): segments fly as (id, seg_idx, 60-bit seg hash)
    * triples — text never enters the band join; word-salad segments are
    * high-entropy keys (hot-key mass would surface as a skewed band join,
    * the LSH hot-bucket guard applies unchanged); the verify re-join
    * fetches the two texts by uniform id keys, candidates only.
    */
  def editNearDups(spark: SparkSession, sfDir: String): DataFrame =
    editNearDupsFrom(editTwinCorpus(spark, sfDir))

  /** [[editNearDups]] over any (doc_id, text) corpus. */
  def editNearDupsFrom(corpus: DataFrame): DataFrame = {
    val nSegs = EditMaxK + 1
    def segExpr(i: Int): String =
      s"substring(text, $i * (length(text) div $nSegs) + " +
        s"least($i, length(text) % $nSegs) + 1, " +
        s"(length(text) div $nSegs) + " +
        s"(CASE WHEN $i < length(text) % $nSegs THEN 1 ELSE 0 END))"
    val segs = corpus.select(col("doc_id"),
      posexplode(array((0 until nSegs).map(i => expr(segExpr(i))): _*))
        .as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx"), TrainingOps.hash60(col("seg")).as("segh"))
    val cand = segs.as("a").join(segs.as("b"),
        col("a.seg_idx") === col("b.seg_idx") &&
          col("a.segh") === col("b.segh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val texts = corpus.select(col("doc_id"), col("text"))
    cand
      .join(texts.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
      .join(texts.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("lev"))
      .withColumn("is_dup", col("lev") <= EditMaxK)
  }

  /** Indel-twin ids: A = delete+insert (lev 2, length-preserving but
    * SHIFTED middle — the case aligned blocking structurally misses),
    * B = single insert (lev 1, length +1).
    */
  val IndelTwinOffsetA = 2000000L
  val IndelTwinOffsetB = 3000000L

  /** The documents corpus plus two INDEL twins per doc: twin A deletes
    * the character at `lo` and inserts '~' at `hi` (levenshtein ≤ 2,
    * length unchanged, every character in (lo, hi) shifted by one), twin
    * B inserts '~' at `lo` (levenshtein 1, length +1). Positions derive
    * from doc_id exactly as [[editTwinCorpus]]'s, so the oracle replants
    * identically.
    */
  def indelTwinCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = TrainingOps.docs(spark, sfDir).select("doc_id", "text")
    val pos = base
      .withColumn("p1", expr("(doc_id % length(text)) + 1"))
      .withColumn("p2",
        expr("((doc_id + (length(text) div 2)) % length(text)) + 1"))
      .withColumn("lo", least(col("p1"), col("p2")))
      .withColumn("hi", greatest(col("p1"), col("p2")))
    val twinA = pos.select(
      (col("doc_id") + IndelTwinOffsetA).as("doc_id"),
      // delete at lo, insert '~' before hi: the span [lo, hi) shifts
      expr("concat(substring(text, 1, lo - 1), " +
        "substring(text, lo + 1, hi - lo - 1), '~', " +
        "substring(text, hi))").as("text"))
    val twinB = pos.select(
      (col("doc_id") + IndelTwinOffsetB).as("doc_id"),
      expr("concat(substring(text, 1, lo - 1), '~', substring(text, lo))")
        .as("text"))
    base.unionByName(twinA).unionByName(twinB)
  }

  /** Edit-distance near-dup with PassJoin's SHIFTED-SEGMENT probes
    * (oracled as q_doc_indel_dups) — closes [[editNearDupsFrom]]'s
    * disclosed substitution-only reach. Pigeonhole for EDIT distance
    * (Li, Deng, Feng: PassJoin, VLDB 2012 — public method): if
    * lev(a, b) ≤ K, some segment of b receives zero edits in the optimal
    * alignment, so it occurs EXACTLY in a at a start position displaced
    * by at most K (the indels before it). The index side emits each
    * doc's K+1 own-length segments keyed (seg_idx, own_len, hash); the
    * probe side emits, for every target length l within ±K of its own
    * and every displacement δ ∈ [−K, K], the substring a length-l
    * string's segment i would have to equal — (K+1)·(2K+1)² = 75 probe
    * hashes per doc at K = 2, all row-local (PassJoin §4's
    * position-aware windows would trim this ~3×; the full window is the
    * correct superset and the disclosed cost). Join on the three-part
    * key, exact `levenshtein` verify on candidates only — the aligned
    * operator's scale shape with a constant-factor wider probe side.
    */
  def editNearDupsIndel(spark: SparkSession, sfDir: String): DataFrame =
    editNearDupsIndelFrom(indelTwinCorpus(spark, sfDir))

  /** [[editNearDupsIndel]] over any (doc_id, text) corpus. */
  def editNearDupsIndelFrom(corpus: DataFrame): DataFrame = {
    val nSegs = EditMaxK + 1
    val k = EditMaxK
    def start(i: String, l: String) =
      s"$i * ($l div $nSegs) + least($i, $l % $nSegs) + 1"
    def segLen(i: String, l: String) =
      s"($l div $nSegs) + (CASE WHEN $i < $l % $nSegs THEN 1 ELSE 0 END)"
    // index side: own-length segments (the aligned operator's frame,
    // plus the length key)
    val segs = corpus
      .filter(length(col("text")) >= nSegs)
      .select(col("doc_id"), length(col("text")).as("l"),
        posexplode(array((0 until nSegs).map(i => expr(
          s"substring(text, ${start(i.toString, "length(text)")}, " +
            s"${segLen(i.toString, "length(text)")})")): _*))
          .as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx"), col("l"),
        TrainingOps.hash60(col("seg")).as("segh"))
    // probe side: (i, dl, sh) lattice — the substring a length-l string's
    // segment i must equal, looked for at displacement sh in THIS doc
    val lattice =
      s"""flatten(flatten(transform(sequence(0, ${nSegs - 1}), i ->
         |  transform(sequence(-$k, $k), dl ->
         |    transform(sequence(-$k, $k), sh ->
         |      named_struct('i', i, 'dl', dl, 'sh', sh))))))""".stripMargin
    val probes = corpus
      .filter(length(col("text")) >= nSegs)
      .select(col("doc_id").as("probe_id"), col("text"),
        length(col("text")).as("lp"),
        explode(expr(lattice)).as("c"))
      .withColumn("l", col("lp") + col("c.dl"))
      .filter(col("l") >= nSegs)
      .withColumn("ps", expr(
        s"${start("c.i", "l")} + c.sh"))
      .withColumn("plen", expr(segLen("c.i", "l")))
      .filter(col("ps") >= 1 && col("ps") + col("plen") - 1 <= col("lp"))
      .select(col("probe_id"), col("c.i").as("seg_idx"), col("l"),
        TrainingOps.hash60(expr("substring(text, ps, plen)")).as("probeh"))
      .distinct()
    val cand = probes.join(segs,
        probes("seg_idx") === segs("seg_idx") &&
          probes("l") === segs("l") &&
          probes("probeh") === segs("segh") &&
          probes("probe_id") =!= segs("doc_id"))
      .select(least(col("probe_id"), col("doc_id")).as("id_a"),
        greatest(col("probe_id"), col("doc_id")).as("id_b"))
      .distinct()
    val texts = corpus.select(col("doc_id"), col("text"))
    cand
      .join(texts.select(col("doc_id").as("id_a"), col("text").as("ta")),
        "id_a")
      .join(texts.select(col("doc_id").as("id_b"), col("text").as("tb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("lev"))
      .withColumn("is_dup", col("lev") <= EditMaxK)
  }

  // ========================================================= PII ===

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Documents with deterministically planted PII: every 5th doc gains an
    * email, every 7th a 555-phone, every 11th a dotted-quad IP — all
    * derived from doc_id so the oracle replants identically.
    */
  def piiCorpus(spark: SparkSession, sfDir: String): DataFrame =
    TrainingOps.docs(spark, sfDir).select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(""),
      when(col("doc_id") % 7 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 11 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 3) % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"))).otherwise(""))
      .as("text"))

  /** PII detection + redaction (oracled as q_doc_pii): per-doc match
    * counts for the three pattern families and the redacted text
    * (`<EMAIL>`/`<PHONE>`/`<IP>` placeholders). Row-local, codegen'd
    * regex — zero shuffles, the scan IS the job; the patterns avoid
    * backreferences/lookahead so Java regex and DuckDB's RE2 agree.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    piiScrubOf(piiCorpus(spark, sfDir))

  /** [[piiScrub]] over any (doc_id, text) corpus. */
  def piiScrubOf(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(IpRe)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        IpRe, "<IP>").as("clean_text"))

  // ================================================== boilerplate ===

  /** Documents re-shaped as line-structured pages: body plus two per-host
    * (source) footer lines every page of the host shares, plus a unique
    * note line on every 3rd doc — ' | ' is the line separator.
    */
  def linedCorpus(spark: SparkSession, sfDir: String): DataFrame =
    TrainingOps.docs(spark, sfDir).select(col("doc_id"), col("source"),
      concat(
        col("text"),
        lit(" | all rights reserved "), col("source"),
        lit(" | subscribe to "), col("source"), lit(" newsletter"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" | unique note "), col("doc_id").cast("string")))
          .otherwise("")).as("text"))

  /** Host-level boilerplate removal (oracled as q_doc_boilerplate): a line
    * is boilerplate for a host when ≥ 2 AND ≥ 50% of the host's docs carry
    * it; boilerplate lines are dropped and the survivors reassemble in
    * original order. Integer threshold math (dcount·2 ≥ n_docs) — no
    * float ratio to disagree on.
    *
    * Scale shape: lines travel as (source, 60-bit line hash) keys through
    * the frequency aggregate — line text stays only on the doc-side rows;
    * both joins are uniform-key (the per-source doc count broadcasts);
    * reassembly groups by doc_id, so partition mass is per-doc line
    * counts, never per-host.
    */
  def boilerplateRemoval(spark: SparkSession, sfDir: String): DataFrame =
    boilerplateRemovalOf(linedCorpus(spark, sfDir))

  /** [[boilerplateRemoval]] over any (doc_id, source, text) corpus. */
  def boilerplateRemovalOf(corpus: DataFrame): DataFrame = {
    val lines = corpus
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), " \\| ")).as(Seq("pos", "line")))
      .withColumn("lh", TrainingOps.hash60(col("line")))
    val freq = lines.select("source", "lh", "doc_id").distinct()
      .groupBy("source", "lh").agg(count(lit(1)).as("dcount"))
    val srcDocs = corpus.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    val flagged = lines
      .join(freq, Seq("source", "lh"))
      .join(broadcast(srcDocs), Seq("source"))
      .withColumn("boiler",
        col("dcount") >= 2 && col("dcount") * 2 >= col("n_docs"))
    val tot = flagged.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    val kept = flagged.filter(!col("boiler"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("kept_lines"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), " | ").as("clean_text"))
    tot.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
