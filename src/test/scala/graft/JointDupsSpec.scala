package graft

import graft.operators.TrainingOps

/** Laws for the joint image+caption dedup
  * (TrainingOps.jointImageCaptionDups): the conjunction is strictly
  * stronger than either modality, every re-encode twin is recovered, and
  * caption disagreement vetoes a phash band collision.
  */
class JointDupsSpec extends SparkTestBase {

  private lazy val rows =
    TrainingOps.jointImageCaptionDups(spark, nImages = 400L).collect()

  test("joint dups are a subset of phash dups and of caption matches") {
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val joint = r.getAs[Boolean]("is_joint_dup")
      !joint || (r.getAs[Long]("hamming") <= 6L &&
        r.getAs[Boolean]("caption_match"))
    })
  }

  test("every re-encode twin is a joint dup (both tests pass on all 400)") {
    val joint = rows.filter(_.getAs[Boolean]("is_joint_dup"))
      .map(r => (r.getAs[String]("image_a"), r.getAs[String]("image_b")))
      .toSet
    val expected = (0L until 400L)
      .map(i => (f"img-$i%08d", f"img-$i%08d_d")).toSet
    assert(expected.subsetOf(joint),
      s"missing twins: ${(expected -- joint).take(3)}")
  }

  test("caption disagreement vetoes: no cross-image pair is joint") {
    // distinct source images never share a caption, so the joint set is
    // EXACTLY the twin set — any extra pair would be a band collision
    // that caption equality failed to veto
    val joint = rows.filter(_.getAs[Boolean]("is_joint_dup"))
      .map(r => (r.getAs[String]("image_a"), r.getAs[String]("image_b")))
      .toSet
    val expected = (0L until 400L)
      .map(i => (f"img-$i%08d", f"img-$i%08d_d")).toSet
    assert(joint == expected)
    // and the veto is exercised: some phash candidate pairs DO disagree
    // on caption (otherwise this test proves nothing)
    assert(rows.exists(r => !r.getAs[Boolean]("caption_match")))
  }
}
