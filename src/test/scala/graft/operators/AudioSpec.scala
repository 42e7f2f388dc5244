package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** mm_audio_dedup — the PCM byte round-trip against the closed-form
  * arithmetic path, and the planted triage structure of the clip
  * corpus. */
class AudioSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("the byte-decode kernel reproduces the closed-form frame " +
      "codes exactly (PCM encode -> parse is lossless)") {
    val engine = Audio.fingerprint(Audio.audioPayloads(s)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(engine === Audio.codesClosedForm.toSet)
  }

  test("planted triage structure: re-encodes near 0, edits small " +
      "but nonzero, unrelated seeds absent") {
    val pairs = Audio.mmAudioDedup(s, "unused").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // +1 DC offset (the re-encoded copy): Hamming <= 1
    assert(pairs((1L, 3L)) <= 1L && pairs((6L, 7L)) <= 1L)
    // audible edit: nonzero but within the confirm threshold
    assert(pairs((1L, 2L)) > 1L && pairs((1L, 2L)) <= Audio.AudioMaxHam)
    assert(pairs((4L, 5L)) > 1L && pairs((4L, 5L)) <= Audio.AudioMaxHam)
    // no pair crosses synthesis seeds
    val fam = Audio.AudioClips.map(c => c._1 -> c._2).toMap
    assert(pairs.keys.forall { case (a, b) => fam(a) == fam(b) })
    // singleton seeds (8, 9) never appear
    assert(pairs.keys.forall { case (a, b) =>
      a != 8L && b != 8L && a != 9L && b != 9L })
  }

  test("every clip yields the full frame sequence") {
    val n = (Audio.ClipSamples - Audio.FrameLen) / Audio.FrameHop + 1
    val byClip = Audio.codesClosedForm.groupBy(_._1)
    assert(byClip.size === Audio.AudioClips.size)
    assert(byClip.values.forall(_.map(_._2).sorted ==
      (0 until n).map(_.toLong)))
  }
}
