package graft

import org.apache.spark.sql.functions._

import graft.seen.{BloomFilter, UrlSeen}

class UrlSeenSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom filter: zero false negatives, FPP within budget") {
    val n = 100000
    val bf = BloomFilter.create(n, 1e-4)
    val keys = (0 until n).map(i => graft.model.Fixtures.mix(7L, i.toLong))
    keys.foreach(bf.put)
    assert(keys.forall(bf.mightContain), "false negative!")
    // probe disjoint keys; observed FPP should be ≤ ~3x the design point
    val probes = (0 until 200000).map(i => graft.model.Fixtures.mix(99L, i.toLong))
      .filterNot(keys.toSet)
    val fp = probes.count(bf.mightContain)
    val observed = fp.toDouble / probes.size
    assert(observed <= 3e-4, s"observed FPP $observed")
  }

  test("bloom serialized probe agrees with object probe") {
    val bf = BloomFilter.create(1000, 1e-6)
    val keys = (0L until 1000L).map(graft.model.Fixtures.mix64)
    keys.foreach(bf.put)
    val bytes = bf.serialize()
    val back = BloomFilter.deserialize(bytes)
    (0L until 5000L).map(graft.model.Fixtures.mix64).foreach { k =>
      assert(bf.mightContain(k) === BloomFilter.mightContainSerialized(bytes, k))
      assert(bf.mightContain(k) === back.mightContain(k))
    }
  }

  test("two-phase filterUnseen is EXACT: equals plain anti-join") {
    val all = spark.range(0, 20000)
      .select(concat(lit("https://h"), (col("id") % 37).cast("string"),
        lit(".example.com/a/"), col("id").cast("string")).as("url"),
        col("id"))
    val seen = all.filter(col("id") % 3 === 0).select("url")
    val candidates = all.filter(col("id") >= 10000)
    val nSeg = 8
    val segments = UrlSeen.buildSegments(seen, "url", nSeg,
      expectedItemsPerSegment = 2000, fpp = 1e-4)
    assert(segments.count() === nSeg)
    val got = UrlSeen.filterUnseen(candidates, segments, seen, "url", nSeg)
      .select("id").as[Long].collect().sorted
    val expected = UrlSeen.filterUnseenExact(candidates, seen, "url")
      .select("id").as[Long].collect().sorted
    assert(got.length === expected.length)
    assert(got.toSeq === expected.toSeq)
    // sanity: candidates with id%3==0 are all dropped
    assert(got.forall(_ % 3 != 0))
  }

  test("partitioned segment build equals the Aggregator formulation bitwise") {
    val seen = spark.range(0, 5000)
      .select(concat(lit("https://h"), (col("id") % 13).cast("string"),
        lit(".example.com/a/"), col("id").cast("string")).as("url"))
    def collectSegs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bloom"))
        .sortBy(_._1)
    val fast = collectSegs(UrlSeen.buildSegments(seen, "url", 4, 2000, 1e-4))
    val agg = collectSegs(UrlSeen.buildSegmentsAgg(seen, "url", 4, 2000, 1e-4))
    assert(fast.map(_._1).toSeq === agg.map(_._1).toSeq)
    fast.zip(agg).foreach { case ((s, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b), s"segment $s bytes differ")
    }
  }

  test("co-partitioned probe ≡ broadcast probe ≡ exact anti-join") {
    val all = spark.range(0, 20000)
      .select(concat(lit("https://h"), (col("id") % 37).cast("string"),
        lit(".example.com/a/"), col("id").cast("string")).as("url"),
        col("id"))
    val seen = all.filter(col("id") % 3 === 0).select("url")
    val candidates = all.filter(col("id") >= 10000)
    val nSeg = 8
    val segments = UrlSeen.buildSegments(seen, "url", nSeg,
      expectedItemsPerSegment = 2000, fpp = 1e-4)
    val expected = UrlSeen.filterUnseenExact(candidates, seen, "url")
      .select("id").as[Long].collect().sorted
    // force the co-partitioned dispatch via a zero broadcast budget
    val viaDispatch = UrlSeen.filterUnseen(candidates, segments, seen, "url",
        nSeg, maxBroadcastBytes = 0L)
      .select("id").as[Long].collect().sorted
    assert(viaDispatch.toSeq === expected.toSeq)
    // direct call, schema preserved
    val direct = UrlSeen.filterUnseenCopartitioned(
      candidates, segments, seen, "url", nSeg)
    assert(direct.columns.toSeq === Seq("url", "id"))
    assert(direct.select("id").as[Long].collect().sorted.toSeq === expected.toSeq)
  }

  test("co-partitioned probe with empty + missing segments stays exact") {
    // 2 segments populated out of 16: probe must treat missing segment
    // rows as definitely-unseen, not error or drop
    val seen = spark.range(0, 40)
      .select(concat(lit("https://s.com/"), col("id").cast("string")).as("url"))
    val candidates = spark.range(0, 4000)
      .select(concat(lit("https://s.com/"), col("id").cast("string")).as("url"),
        col("id"))
    val segments = UrlSeen.buildSegments(seen, "url", 16, 100, 1e-4)
    val got = UrlSeen.filterUnseenCopartitioned(
      candidates, segments, seen, "url", 16)
    assert(got.count() === 3960)
  }

  test("flagSeen truth table identical on every variant, incl. NULL urls " +
      "(ADVICE r3: NULL must flag false everywhere, never drop or NPE)") {
    val all = spark.range(0, 2000)
      .select(
        // every 100th url NULL — the case xxhash64 turns into a NULL probe
        when(col("id") % 100 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("https://h"), (col("id") % 11).cast("string"),
            lit(".example.com/a/"), col("id").cast("string"))).as("url"),
        col("id"))
    val seen = all.filter(col("id") % 3 === 0 && col("url").isNotNull)
      .select("url")
    val segments = UrlSeen.buildSegments(seen, "url", 4, 1000, 1e-4)
      .persist()
    def table(probe: graft.seen.SeenProbe): Map[Long, Boolean] =
      UrlSeen.flagSeen(all, probe, "url", "seen_flag")
        .select("id", "seen_flag").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = table(graft.seen.SeenProbe.Exact(seen))
    val bloomBc = table(graft.seen.SeenProbe.BloomConfirm(segments, seen, 4))
    val bloomCo = table(graft.seen.SeenProbe.BloomConfirm(segments, seen, 4,
      maxBroadcastBytes = 0L))
    val cuckooSegs = UrlSeen.buildCuckooSegments(seen, "url", 4, 1000)
      .persist()
    val cuckooBc = table(graft.seen.SeenProbe.CuckooConfirm(cuckooSegs, seen, 4))
    val cuckooCo = table(graft.seen.SeenProbe.CuckooConfirm(cuckooSegs, seen, 4,
      maxBroadcastBytes = 0L))
    segments.unpersist()
    cuckooSegs.unpersist()
    assert(exact.size === 2000, "Exact variant dropped rows")
    assert(bloomBc === exact, "broadcast Bloom probe truth table diverges")
    assert(bloomCo === exact, "co-partitioned Bloom probe truth table diverges")
    assert(cuckooBc === exact, "broadcast cuckoo probe truth table diverges")
    assert(cuckooCo === exact, "co-partitioned cuckoo probe truth table diverges")
    // NULL urls present, kept, and flagged unseen on the reference variant
    val nullIds = (0L until 2000L by 100L).toSet
    assert(nullIds.forall(id => exact(id) == false))
  }

  test("cuckoo filter: membership, serialized-probe equality, FPP bound, " +
      "loud overflow (r3 ask #7)") {
    val keys = (0L until 9000L).map(i =>
      graft.model.Fixtures.mix(101L, i)).toArray
    val f = graft.seen.CuckooFilter.create(10000L)
    keys.foreach(f.put)
    assert(keys.forall(f.mightContain), "inserted key not found")
    val ser = f.serialize()
    assert(keys.forall(k =>
      graft.seen.CuckooFilter.mightContainSerialized(ser, k)),
      "serialized probe disagrees with object probe")
    // FPP: 32-bit fingerprints, 4-slot buckets → bound ≈ 1.9e-9; observe 0
    // false positives over 200k non-member probes (expected FP count 4e-4)
    val nonMembers = (0L until 200000L).map(i =>
      graft.model.Fixtures.mix(999L, i)).filterNot(keys.toSet)
    val fps = nonMembers.count(f.mightContain)
    assert(fps === 0, s"$fps false positives in ${nonMembers.size} probes")
    // deletion: remove half, removed gone, kept intact
    val (del, keep) = keys.splitAt(4500)
    del.foreach(k => assert(f.delete(k), s"delete failed for $k"))
    assert(del.forall(!f.mightContain(_)), "deleted key still present")
    assert(keep.forall(f.mightContain), "deletion corrupted a kept key")
    // overflow is LOUD, never silent degradation
    val tiny = graft.seen.CuckooFilter.create(64L)
    assertThrows[IllegalStateException] {
      (0L until 10000L).foreach(i => tiny.put(graft.model.Fixtures.mix(7L, i)))
    }
  }

  test("cuckoo retraction: delete-then-recrawl flips seen→unseen; " +
      "the raw prefilter itself no longer fires (what Bloom can't do)") {
    val all = spark.range(0, 1000)
      .select(concat(lit("https://recrawl.example.com/p/"),
        col("id").cast("string")).as("url"), col("id"))
    val seen0 = all.filter(col("id") < 500).select("url").persist()
    val segs0 = UrlSeen.buildCuckooSegments(seen0, "url", 4, 1000).persist()
    def flags(segs: org.apache.spark.sql.DataFrame,
        seen: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      UrlSeen.flagSeen(all, graft.seen.SeenProbe.CuckooConfirm(segs, seen, 4),
        "url", "f").select("id", "f").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val before = flags(segs0, seen0)
    assert((0L until 500L).forall(before(_)), "seeded urls must flag seen")
    // retract ids 100-199: recrawl directive removes them from the exact
    // seen table AND their fingerprints from the cuckoo segments
    val retract = all.filter(col("id") >= 100 && col("id") < 200).select("url")
    val seen1 = seen0.join(retract.withColumnRenamed("url", "r"),
      col("url") === col("r"), "left_anti").select("url").persist()
    val segs1 = UrlSeen.deleteFromCuckooSegments(segs0, retract, "url", 4)
      .persist()
    val after = flags(segs1, seen1)
    assert((100L until 200L).forall(!after(_)),
      "retracted urls must flag unseen (recrawl-eligible)")
    assert((0L until 100L).forall(after(_)) &&
      (200L until 500L).forall(after(_)),
      "retraction corrupted an untouched url")
    assert((500L until 1000L).forall(!after(_)))
    // the part Bloom cannot express: the PREFILTER itself stopped firing
    // for the retracted urls — not just the confirm join. With Bloom the
    // stale positives would each cost a confirm-join row forever.
    val segArr = new Array[Array[Byte]](4)
    segs1.collect().foreach(r =>
      segArr(r.getLong(0).toInt) = r.getAs[Array[Byte]]("bloom"))
    val retractedHashes = retract
      .select(org.apache.spark.sql.functions.xxhash64(col("url")))
      .collect().map(_.getLong(0))
    assert(retractedHashes.forall(h => !UrlSeen.probeCuckooSegments(segArr, h)),
      "prefilter still fires for a retracted url")
    Seq(seen0, segs0, seen1, segs1).foreach(_.unpersist())
  }

  test("filterUnseen with empty seen set passes everything through") {
    val candidates = spark.range(0, 100)
      .select(concat(lit("https://x.com/"), col("id").cast("string")).as("url"))
    val emptySeen = candidates.filter(lit(false))
    val segments = UrlSeen.buildSegments(emptySeen, "url", 4, 100, 1e-4)
    val got = UrlSeen.filterUnseen(candidates, segments, emptySeen, "url", 4)
    assert(got.count() === 100)
  }
}
