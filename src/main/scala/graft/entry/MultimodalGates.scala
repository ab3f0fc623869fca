package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.llm._
import GateSupport._

/** Multimodal binary-column gates: feature extraction, dispatch, frames, real PNG/GIF/JPEG/WAV decode, resize.
  *
  * One registry entry per operator: (name, spark fn, oracle SQL) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]].
  */
private[graft] object MultimodalGates {
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // ---- multimodal plumbing ---------------------------------------------
    ("multimodal_features",
      (s: SparkSession, dir: String) =>
        Multimodal.extractFeatures(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text")).toDF(),
      {
        // all features read the UTF-8 BYTE list (utf8BytesSql), exactly
        // what Spark's payload holds — ascii()/substr() per CHARACTER
        // would diverge on the non-ASCII fixture rows
        val mean = Num.r6Sql(
          "CASE WHEN len(b) = 0 THEN 0.0 ELSE CAST(list_reduce(b, (a, x) -> a + x) AS DOUBLE) / CAST(len(b) AS DOUBLE) END")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs)
           |SELECT doc_id AS id, CAST(len(b) AS BIGINT) AS n_bytes,
           |  CAST(CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END AS INT) AS width,
           |  CAST(CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END AS INT) AS height,
           |  $mean AS mean_byte
           |FROM bd""".stripMargin
      }),

    ("multimodal_dispatch",
      (s: SparkSession, dir: String) =>
        Multimodal.dispatchFeatures(s,
          Multimodal.attachMixedPayload(withNonAsciiDocs(s, dir), "doc_id", "text")).toDF(),
      {
        // byte-list formulation (utf8BytesSql): Spark reads PAYLOAD
        // BYTES, and the non-ASCII fixture rows would expose any
        // per-character ascii()/strlen() shortcut
        val mean = Num.r6Sql(
          "CASE WHEN len(b) = 0 THEN 0.0 ELSE CAST(list_reduce(b, (a, x) -> a + x) AS DOUBLE) / CAST(len(b) AS DOUBLE) END")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs)
           |SELECT doc_id AS id,
           |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           |  CAST(len(b) AS BIGINT) AS n_bytes,
           |  CASE doc_id % 3
           |    WHEN 0 THEN CAST((CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END)
           |                   * (CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END) AS DOUBLE)
           |    WHEN 1 THEN $mean
           |    ELSE CAST(len(b) AS DOUBLE) END AS feature
           |FROM bd""".stripMargin
      }),

    ("multimodal_frames",
      (s: SparkSession, dir: String) =>
        Multimodal.frameFeatures(Multimodal.sampleFrames(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text"),
          frameBytes = 64, stride = 2)).toDF(),
      {
        // frames slice the BYTE list, not the character string: a
        // multi-byte char on a 64-byte boundary splits across frames on
        // the Spark side, and the oracle must split it identically
        val mean = Num.r6Sql(
          "CAST(list_reduce(blk, (a, x) -> a + x) AS DOUBLE) / CAST(len(blk) AS DOUBLE)")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs),
           |f AS (SELECT doc_id, b,
           |        unnest(generate_series(0, CAST((len(b) - 1) // 64 AS INT))) AS fi
           |      FROM bd),
           |blks AS (SELECT doc_id, fi, list_slice(b, fi * 64 + 1, fi * 64 + 64) AS blk
           |         FROM f WHERE fi % 2 = 0)
           |SELECT doc_id AS id, CAST(fi AS INT) AS frame_idx,
           |       CAST(len(blk) AS BIGINT) AS n_bytes, $mean AS mean_byte
           |FROM blks""".stripMargin
      }),

    ("multimodal_decode_png",
      (s: SparkSession, dir: String) => {
        // REAL compressed PNGs (encoded in executors from the id) decoded
        // back through javax.imageio at the codec boundary: width/height
        // come from the actual header, mean_pixel from the actual raster.
        // n_bytes is dropped from the gate (PNG encoder output size is
        // implementation-defined); a spec asserts it is > 0
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachPngPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"),
            col("mean_byte").as("mean_pixel"))
      },
      // closed form of the synthesized raster: w=1+id%7, h=1+id%5, pixel
      // (0,0) colored (id,2id,3id)%251, the rest gray g=id%251 ->
      // 3-channel mean = (3g*(wh-1) + r0+g0+b0) / (3wh)
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
         |             doc_id % 251 AS g,
         |             doc_id % 251 + (2 * doc_id) % 251 + (3 * doc_id) % 251 AS c0
         |           FROM documents WHERE doc_id <= 30)
         |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  ${Num.r6Sql("CAST(3 * g * (w * h - 1) + c0 AS DOUBLE) / CAST(3 * w * h AS DOUBLE)")} AS mean_pixel
         |FROM d""".stripMargin),

    ("multimodal_decode_gif",
      (s: SparkSession, dir: String) => {
        // REAL GIFs (JDK-native codec). The synthetic raster has at
        // most two distinct colors, so the palette-indexed encode is
        // LOSSLESS and the gate covers the decoded raster mean exactly,
        // like PNG — a fake-decoder fall-through would read the 'GI'
        // magic as w=71, h=73, never 1..7 x 1..5
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachGifPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"),
            col("mean_byte").as("mean_pixel"))
      },
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
         |             doc_id % 251 AS g,
         |             doc_id % 251 + (2 * doc_id) % 251 + (3 * doc_id) % 251 AS c0
         |           FROM documents WHERE doc_id <= 30)
         |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  ${Num.r6Sql("CAST(3 * g * (w * h - 1) + c0 AS DOUBLE) / CAST(3 * w * h AS DOUBLE)")} AS mean_pixel
         |FROM d""".stripMargin),

    ("multimodal_decode_jpeg",
      (s: SparkSession, dir: String) => {
        // REAL JPEGs (JDK-native codec) round-tripped through ImageIO.
        // JPEG headers carry exact dims but the raster is LOSSY, so the
        // hash gate covers id/width/height only — and dims still prove
        // the real decode path ran: a fall-through to the fake decoder
        // would read the FFD8 magic as w=255, h=216, never 1..7 x 1..5.
        // The raster mean is checked with a tolerance bound in
        // DedupSimilaritySpec
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachJpegPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"))
      },
      """SELECT doc_id AS id, CAST(1 + doc_id % 7 AS INT) AS width,
        |       CAST(1 + doc_id % 5 AS INT) AS height
        |FROM documents WHERE doc_id <= 30""".stripMargin),

    ("multimodal_decode_wav",
      (s: SparkSession, dir: String) => {
        // REAL RIFF/WAVE PCM (encoded in executors from the id) decoded
        // back through javax.sound.sampled at the codec boundary: sample
        // rate + channels from the parsed format, frame count from the
        // bytes actually read, mean |sample| from the actual PCM — a
        // fall-through to the fake decoder emits sample_rate = 0, never
        // 8000/16000/24000, and frame 0 carries a different sample value
        // than the rest so a header-only "decode" cannot match either.
        // n_bytes is dropped from the gate (container size is
        // writer-defined); a spec asserts it exceeds the 44-byte header
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 40)
        Multimodal.extractAudioFeatures(s,
          Multimodal.attachWavPayload(s, ids, "doc_id")).toDF()
      },
      // closed form of the synthesized PCM: sr = 8000*(1+id%3),
      // ch = 1+id%2, nf = 8+id%25, frame 0 = (id*53)%101-50, the rest
      // (id*37)%101-50; every channel repeats the frame value, so the
      // 1-or-2 channel factor cancels exactly in IEEE division and
      // mean_abs = (|b0| + (nf-1)*|a|) / nf
      s"""WITH d AS (SELECT doc_id, 8000 * (1 + doc_id % 3) AS sr,
         |             1 + doc_id % 2 AS ch, 8 + doc_id % 25 AS nf,
         |             abs((doc_id * 53) % 101 - 50) AS b0,
         |             abs((doc_id * 37) % 101 - 50) AS a
         |           FROM documents WHERE doc_id <= 40)
         |SELECT doc_id AS id, CAST(sr AS INT) AS sample_rate,
         |  CAST(ch AS INT) AS channels, CAST(nf AS BIGINT) AS n_frames,
         |  ${Num.r6Sql("CAST(nf AS DOUBLE) / CAST(sr AS DOUBLE)")} AS duration_sec,
         |  ${Num.r6Sql("CAST(b0 + (nf - 1) * a AS DOUBLE) / CAST(nf AS DOUBLE)")} AS mean_abs
         |FROM d""".stripMargin),

    ("multimodal_decode_avi",
      (s: SparkSession, dir: String) => {
        // REAL RIFF/AVI video (encoded in executors from the id) parsed
        // back through the pure-JDK container walker: width/height from
        // the avih header, frame count from the 00db chunks actually
        // present, mean over every frame's actual pixel bytes — BI_RGB
        // frames are uncompressed, so unlike JPEG the raster
        // round-trips exactly and the gate covers the decoded mean. A
        // fall-through to the fake decoder would read the 'RI' magic as
        // w=82, h=73, never 1..7 x 1..5
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractVideoFeatures(s,
          Multimodal.attachAviPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"), col("n_frames"),
            col("mean_byte").as("mean_pixel"))
      },
      // closed form of the synthesized frames: w=1+id%7, h=1+id%5,
      // nf=1+id%4; frame f gray g_f=(id+31f)%251 except pixel (0,0)
      // colored (id,2id,3id)%251 -> mean = (3*Σg_f*(wh-1) + nf*c0)
      // / (3*wh*nf)
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
         |             1 + doc_id % 4 AS nf,
         |             doc_id % 251 + (2 * doc_id) % 251 + (3 * doc_id) % 251 AS c0
         |           FROM documents WHERE doc_id <= 30),
         |fr AS (SELECT doc_id, w, h, nf, c0,
         |         unnest(generate_series(0, CAST(nf - 1 AS INT))) AS f
         |       FROM d),
         |sg AS (SELECT doc_id, min(w) AS w, min(h) AS h, min(nf) AS nf,
         |         min(c0) AS c0, sum((doc_id + 31 * f) % 251) AS gsum
         |       FROM fr GROUP BY doc_id)
         |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  CAST(nf AS BIGINT) AS n_frames,
         |  ${Num.r6Sql("CAST(3 * gsum * (w * h - 1) + nf * c0 AS DOUBLE) / CAST(3 * w * h * nf AS DOUBLE)")} AS mean_pixel
         |FROM sg""".stripMargin),

    ("multimodal_resize",
      (s: SparkSession, dir: String) =>
        Multimodal.resizeDims(Multimodal.extractFeatures(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text")),
          maxW = 100, maxH = 80).toDF(),
      s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
         |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs),
         |d AS (SELECT doc_id AS id,
         |        CAST(CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END AS INT) AS width,
         |        CAST(CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END AS INT) AS height
         |      FROM bd),
         |g AS (SELECT *, greatest(CAST(width AS BIGINT), 1) AS w,
         |        greatest(CAST(height AS BIGINT), 1) AS h FROM d),
         |sc AS (SELECT *, least(1000, least(100 * 1000 // w, 80 * 1000 // h)) AS s FROM g)
         |SELECT id, width, height,
         |       CAST(w * s // 1000 AS INT) AS out_w, CAST(h * s // 1000 AS INT) AS out_h
         |FROM sc""".stripMargin),

    ("multimodal_phash",
      (s: SparkSession, dir: String) =>
        // REAL PNG round-trip under the perceptual hash: 36×32 synthetic
        // photos encoded in executors, decoded through javax.imageio,
        // area-downsampled 9×8 with pure integer arithmetic, dHash split
        // into two 32-bit halves. The oracle evaluates the closed-form
        // raster symbolically — decode losslessness is part of what the
        // hash equality proves
        Multimodal.perceptualHash(s,
          Multimodal.attachPhotoPayload(s,
            t(s, dir, "documents").filter(col("doc_id") <= 130), "doc_id")).toDF(),
      phashOracleCtes + "\nSELECT id, phash_hi, phash_lo FROM ph"),

    ("multimodal_scene_cuts",
      (s: SparkSession, dir: String) =>
        // REAL AVI/DIB round-trip under the mean-intensity cut
        // detector: 24-frame clips with planted +63 jumps at frames 8
        // and 16 (within-scene drift +1); the oracle evaluates the
        // closed-form per-frame gray symbolically, so the reported
        // cuts also prove the per-frame decode
        Multimodal.sceneCuts(s,
          Multimodal.attachClipPayload(s,
            t(s, dir, "documents").filter(col("doc_id") <= 60), "doc_id"),
          threshold = 20L).toDF(),
      """WITH ids AS (SELECT doc_id AS id, doc_id % 100 AS b FROM documents
        |             WHERE doc_id <= 60),
        |fr AS (SELECT id, g.f, (b % 40) + (g.f // 8) * 70 + (g.f % 8) AS gray
        |       FROM ids, generate_series(0, 23) g(f)),
        |d AS (SELECT a.id, CAST(n.f AS INT) AS frame,
        |        CAST(abs(n.gray - a.gray) AS BIGINT) AS diff
        |      FROM fr a JOIN fr n ON a.id = n.id AND n.f = a.f + 1)
        |SELECT id, frame, diff FROM d WHERE diff >= 20""".stripMargin),

    ("multimodal_audio_fingerprint",
      (s: SparkSession, dir: String) =>
        // REAL WAV round-trip under the energy-envelope fingerprint:
        // 256-sample synthetic tones encoded in executors, decoded
        // through javax.sound.sampled, 32-window integer energy
        // envelope, 31 gradient bits. Ids 100 apart are exact sample
        // copies — identical fingerprints, the audio-dedup key. The
        // oracle evaluates the closed-form waveform symbolically
        Multimodal.audioFingerprints(s,
          Multimodal.attachTonePayload(s,
            t(s, dir, "documents").filter(col("doc_id") <= 130), "doc_id")).toDF(),
      """WITH ids AS (SELECT doc_id AS id, doc_id % 100 AS b FROM documents
        |             WHERE doc_id <= 130),
        |ts AS (SELECT id, b, g.t FROM ids, generate_series(0, 255) g(t)),
        |sm AS (SELECT id, t // 8 AS w,
        |         abs((b * (t + 7) * ((t % 13) + 1) + t * t) % 2001 - 1000) AS a
        |       FROM ts),
        |en AS (SELECT id, w, sum(a) AS e FROM sm GROUP BY id, w),
        |bits AS (SELECT a.id, a.w, CASE WHEN n.e > a.e THEN 1 ELSE 0 END AS bit
        |         FROM en a JOIN en n ON a.id = n.id AND n.w = a.w + 1
        |         WHERE a.w <= 30)
        |SELECT id, CAST(sum(bit * (CAST(1 AS BIGINT) << w)) AS BIGINT) AS afp
        |FROM bits GROUP BY id""".stripMargin),

    ("multimodal_phash_neardup",
      (s: SparkSession, dir: String) => {
        // image near-dup pairs: ids 100 apart are planted exact pixel
        // copies (Hamming 0); candidates come only through shared band
        // buckets — never all pairs — with the band count DERIVED from
        // the radius (8×8-bit bands at maxHamming=6: pigeonhole
        // guarantees recall 1.0 through d ≤ 7). The oracle is the
        // BRUTE-FORCE all-pairs scan, deliberately independent of the
        // banding, so the recall guarantee is what the hash match proves
        val hashes = Multimodal.perceptualHash(s,
          Multimodal.attachPhotoPayload(s,
            t(s, dir, "documents").filter(col("doc_id") <= 130), "doc_id")).toDF()
        Multimodal.phashNearDup(hashes, maxHamming = 6)
      },
      s"""$phashOracleCtes
         |SELECT l.id AS id1, r.id AS id2,
         |  CAST(bit_count(xor(l.phash_hi, r.phash_hi))
         |     + bit_count(xor(l.phash_lo, r.phash_lo)) AS INT) AS hamming
         |FROM ph l JOIN ph r ON l.id < r.id
         |WHERE bit_count(xor(l.phash_hi, r.phash_hi))
         |    + bit_count(xor(l.phash_lo, r.phash_lo)) <= 6""".stripMargin),
  )

  /** DuckDB CTE chain ending in `ph(id, phash_hi, phash_lo)` — the
    * closed-form mirror of [[Multimodal.syntheticPhoto]] +
    * [[Multimodal.dHash]]: pixel `p(x,y) = (b·(x+1)·(y+3)+x²+b) mod 251`
    * with `b = id mod 100`, 4×4 integer block means on the 9×8 grid,
    * horizontal-gradient bits packed into two 32-bit halves.
    */
  private lazy val phashOracleCtes: String =
    s"""WITH ids AS (SELECT doc_id AS id, doc_id % 100 AS b FROM documents
       |             WHERE doc_id <= 130),
       |cells AS (SELECT id, b, gi.i, gj.j, gx.dx, gy.dy
       |          FROM ids, generate_series(0, 8) gi(i), generate_series(0, 7) gj(j),
       |               generate_series(0, 3) gx(dx), generate_series(0, 3) gy(dy)),
       |px AS (SELECT id, i, j,
       |         (b * (4 * i + dx + 1) * (4 * j + dy + 3)
       |          + (4 * i + dx) * (4 * i + dx) + b) % 251 AS p
       |       FROM cells),
       |m AS (SELECT id, i, j, sum(p) // 16 AS v FROM px GROUP BY id, i, j),
       |bits AS (SELECT a.id, a.i, a.j,
       |           CASE WHEN n.v > a.v THEN 1 ELSE 0 END AS bit
       |         FROM m a JOIN m n ON a.id = n.id AND a.j = n.j AND n.i = a.i + 1
       |         WHERE a.i <= 7),
       |ph AS (SELECT id,
       |         CAST(sum(CASE WHEN j >= 4
       |           THEN bit * (CAST(1 AS BIGINT) << ((j - 4) * 8 + i)) ELSE 0 END) AS BIGINT) AS phash_hi,
       |         CAST(sum(CASE WHEN j < 4
       |           THEN bit * (CAST(1 AS BIGINT) << (j * 8 + i)) ELSE 0 END) AS BIGINT) AS phash_lo
       |       FROM bits GROUP BY id)""".stripMargin
}
