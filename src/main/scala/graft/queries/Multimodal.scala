package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * per-partition batch stage (the Scala analog of `mapInPandas`).
  *
  * The decode step is a DETERMINISTIC STUB (media codecs aren't in this
  * container — builder prompt): it emits byte length + md5 content hash +
  * a fixed format tag. Everything around it is real and tested: the
  * binary-column schema, the Dataset encoder, the mapPartitions batch shape
  * (one digest instance per partition, streaming iterator — at 100 TB each
  * task decodes its split without driver involvement), and the oracle.
  */
object Multimodal {

  final case class DocBin(doc_id: Long, bin: Array[Byte])

  /** Frame-sampling parameters: 64-byte frames, every 4th frame kept. */
  private val FrameBytes = 64
  private val SampleEvery = 4

  /** Resize target: every payload normalized to 128 bytes. */
  private val ResizeBytes = 128

  /** DuckDB CTE chain `cp` → `b(doc_id, bytes)`: the document payload as its
    * UTF-8 BYTE values (integer list). Round 13: the original oracles read
    * bytes via character-based `ascii(substr(...))`/`CAST(text AS BLOB)`,
    * which agrees with the Spark side's real binary payload ONLY on ASCII
    * text — the seed-variant sweep (tools/datavariants.json) materialized
    * that divergence the moment the token rename introduced multi-byte
    * characters. DuckDB 1.0 has no usable BLOB ops (no md5/substring/index
    * on BLOB), so the oracle expands each code point to its UTF-8 bytes
    * arithmetically — byte-exact against Spark's `cast(text as binary)` for
    * ANY input, pinned by the variant sweep.
    */
  private val Utf8BytesCte: String =
    """cp AS (SELECT doc_id, list_transform(range(1, length(text) + 1),
      |         i -> ascii(substr(text, i, 1))) AS cps
      |       FROM documents),
      |b AS (SELECT doc_id, flatten(list_transform(cps, a ->
      |        CASE WHEN a < 128 THEN [a]
      |             WHEN a < 2048 THEN [192 + a//64, 128 + a%64]
      |             WHEN a < 65536 THEN [224 + a//4096, 128 + (a//64)%64,
      |                                  128 + a%64]
      |             ELSE [240 + a//262144, 128 + (a//4096)%64,
      |                   128 + (a//64)%64, 128 + a%64]
      |        END)) AS bytes
      |      FROM cp)""".stripMargin

  /** 55-bit polynomial content hash of a byte sequence: left fold
    * h → (h·31 + byte) mod 2⁵⁵ from 0 — the stub "decoder" hash for
    * byte SLICES (frames, resized payloads), where md5 can't serve as the
    * cross-engine hash because a byte slice may split a multi-byte char
    * (not valid UTF-8, and DuckDB md5 only takes VARCHAR). 2⁵⁵ keeps
    * h·31 + 255 under 2⁶⁰ — exact BIGINT on both engines, no wrap.
    * [[fnv55]] is the Scala fold; keep the two in lockstep.
    */
  private def foldHashSql(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $listExpr), " +
      s"(h, x) -> (h*31 + x) % ${1L << 55})"

  /** Scala twin of [[foldHashSql]] over a byte-array slice. */
  private def fnv55(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * 31 + (bytes(i) & 0xff)) % (1L << 55); i += 1 }
    h
  }


  val all: Seq[Q] = Seq(

    Q("q_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  'raw' AS format
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        ds.mapPartitions { it =>
          // one digest per partition, reused across the batch (the
          // "expensive decoder init" slot of a real media pipeline)
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            md.reset()
            val hex = md.digest(r.bin).map("%02x".format(_)).mkString
            (r.doc_id, r.bin.length.toLong, hex, "raw")
          }
        }.toDF("doc_id", "n_bytes", "content_hash", "format")
          .orderBy("doc_id")
    },

    // ── frame sampling: fixed-width BYTE frames from the binary payload,
    //    every SampleEvery-th frame hashed (the video-frame-sample
    //    plumbing: schema (doc_id, frame_idx, frame_hash), per-task batch
    //    decode, no driver involvement). A frame is a byte slice that may
    //    split a multi-byte char, so the cross-engine frame hash is the
    //    fnv55 fold over bytes (round 13 — the md5-of-substr oracle was
    //    ASCII-only; see Utf8BytesCte). ─────────────────────────────────────
    Q("q_multimodal_frames",
      s"""WITH $Utf8BytesCte,
        |t AS (SELECT doc_id, bytes, CAST(len(bytes) AS BIGINT) AS L FROM b),
        |f AS (SELECT doc_id, fi,
        |    bytes[fi * $FrameBytes + 1 : (fi + 1) * $FrameBytes] AS frame
        |  FROM t
        |  CROSS JOIN LATERAL (SELECT unnest(range(0,
        |    CAST(ceil(L / ${FrameBytes.toDouble}) AS BIGINT))) AS fi))
        |SELECT doc_id, fi AS frame_idx,
        |  ${foldHashSql("frame")} AS frame_hash,
        |  CAST(len(frame) AS BIGINT) AS frame_bytes
        |FROM f WHERE fi % $SampleEvery = 0
        |ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        ds.mapPartitions { it =>
          it.flatMap { r =>
            val nFrames = math.ceil(r.bin.length / FrameBytes.toDouble).toLong
            (0L until nFrames).filter(_ % SampleEvery == 0).map { fi =>
              val from = (fi * FrameBytes).toInt
              val until = math.min(from + FrameBytes, r.bin.length)
              (r.doc_id, fi, fnv55(r.bin, from, until), (until - from).toLong)
            }
          }
        }.toDF("doc_id", "frame_idx", "frame_hash", "frame_bytes")
          .orderBy("doc_id", "frame_idx")
    },

    // ── resize: normalize every payload to a fixed byte size (truncate or
    //    zero-pad) — the image-resize plumbing stub: same schema/batch
    //    shape as a real resampler, deterministic output. ────────────────
    Q("q_multimodal_resize",
      s"""WITH $Utf8BytesCte
        |SELECT doc_id,
        |  CAST(len(bytes) AS BIGINT) AS orig_bytes,
        |  CAST($ResizeBytes AS BIGINT) AS resized_bytes,
        |  ${foldHashSql(
             // flatten-concat zero pad, NOT list_resize: DuckDB 1.0's
             // list_resize throws std::bad_array_new_length on non-constant
             // slices shorter than the target (measured on short docs)
             s"flatten([bytes[1:$ResizeBytes], list_transform(" +
               s"range(greatest(0, $ResizeBytes - len(bytes))), x -> 0)])")}
        |    AS resized_hash
        |FROM b ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        ds.mapPartitions { it =>
          it.map { r =>
            val out = java.util.Arrays.copyOf(r.bin, ResizeBytes) // trunc/pad0
            (r.doc_id, r.bin.length.toLong, ResizeBytes.toLong,
              fnv55(out, 0, ResizeBytes))
          }
        }.toDF("doc_id", "orig_bytes", "resized_bytes", "resized_hash")
          .orderBy("doc_id")
    },

    // ── feature extraction: per-payload byte statistics as the stubbed
    //    "embedding" (a real pipeline would emit a model feature vector
    //    here; the batch shape, schema and partitioning are identical).
    //    Byte values via the UTF-8 expansion CTE (round 13 — ascii() reads
    //    CODE POINTS, which diverge from Spark's real bytes off-ASCII). ──
    Q("q_multimodal_features",
      s"""WITH $Utf8BytesCte
        |SELECT doc_id,
        |  CAST(len(bytes) AS BIGINT) AS n_bytes,
        |  CAST(list_min(bytes) AS BIGINT) AS min_byte,
        |  CAST(list_max(bytes) AS BIGINT) AS max_byte,
        |  CAST(list_sum(bytes) AS BIGINT) AS sum_byte
        |FROM b ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        ds.mapPartitions { it =>
          it.map { r =>
            var mn = 255L; var mx = 0L; var sum = 0L
            var i = 0
            while (i < r.bin.length) {
              val b = (r.bin(i) & 0xff).toLong
              if (b < mn) mn = b
              if (b > mx) mx = b
              sum += b
              i += 1
            }
            // empty payload -> NULL stats, matching DuckDB's
            // list_min/list_max/list_sum over an empty list (the 255/0
            // sentinels would hash-diverge on a zero-length document)
            if (r.bin.isEmpty) (r.doc_id, 0L, None, None, None)
            else (r.doc_id, r.bin.length.toLong,
              Some(mn), Some(mx), Some(sum))
          }
        }.toDF("doc_id", "n_bytes", "min_byte", "max_byte", "sum_byte")
          .orderBy("doc_id")
    },

    // ── perceptual-hash near-duplicate pairs over the media payloads —
    //    image dedup, the multimodal counterpart of q_simhash_pairs. The
    //    signature is a 60-bit BLOCK-MEAN hash (the aHash family): payload
    //    split into 60 equal byte blocks, bit i = 1 iff block i's mean
    //    exceeds the global mean — compared cross-multiplied in exact
    //    BIGINT (bs·L > total·blen, no division; payloads ≤ ~190 KB keep
    //    the products in range — larger media would switch both engines to
    //    identical floor-divided means). Computed in the mapPartitions
    //    decoder slot (a real pipeline hashes the DECODED image here;
    //    60 bits, not 64: DuckDB raises on 1<<63). Near-dup pairs at
    //    hamming ≤ 8 via the SAME adaptive pigeonhole kernel as SimHash —
    //    an equi-join on packed block combos, never all-pairs; the oracle
    //    verifies by theta join at its own scale, reading REAL UTF-8 bytes
    //    via the expansion CTE (round 13 — the ascii() form was
    //    ASCII-only, and only passed the seed variant vacuously because
    //    divergent signatures still produced the same ≤8-hamming set). ────
    Q("q_phash_pairs",
      s"""WITH $Utf8BytesCte,
        |t AS (SELECT doc_id, bytes, CAST(len(bytes) AS BIGINT) AS L,
        |        CAST(list_sum(bytes) AS BIGINT) AS total
        |      FROM b),
        |blk AS (SELECT doc_id, L, total, i,
        |        coalesce(list_sum(bytes[(i*L//60)+1:((i+1)*L//60)]), 0)::BIGINT AS bs,
        |        ((i+1)*L//60) - (i*L//60) AS blen
        |      FROM t CROSS JOIN range(0, 60) r(i)),
        |sig AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN bs * L > total * blen
        |                      THEN 1::BIGINT << i::INT ELSE 0 END) AS BIGINT) AS sig
        |        FROM blk GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
        |FROM sig a JOIN sig b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val Bits = 60
        val MaxDist = 8
        val ds = spread(documents(s, d))
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        val sig = ds.mapPartitions { it =>
          it.map { r =>
            val L = r.bin.length.toLong
            var total = 0L
            var i = 0
            while (i < r.bin.length) { total += (r.bin(i) & 0xff); i += 1 }
            var sg = 0L
            var blk = 0
            while (blk < Bits) {
              val from = (blk * L / Bits).toInt
              val until = ((blk + 1) * L / Bits).toInt
              var bs = 0L
              var j = from
              while (j < until) { bs += (r.bin(j) & 0xff); j += 1 }
              if (bs * L > total * (until - from)) sg |= 1L << blk
              blk += 1
            }
            (r.doc_id, sg)
          }
        }.toDF("doc_id", "sig")
        // radius 8, not the looser 10: at radius 10 the k ≤ 3 combo key
        // tops out at 12 bits (4096 buckets — saturates before sf1 and
        // the bucket join turns quadratic), while escaping to k = 4 costs
        // a C(14,4) = 1001-combo explode (measured 7× slower at sf0.1).
        // At radius 8, k = 3 packs 15-bit keys (C(11,3) = 165 combos) —
        // but 2^15 covers only 32k docs: the 10×/30× scale points (50k /
        // 150k docs) SATURATE it, occupancy hits 1.5–4.6 and the bucket
        // join goes quadratic (measured exponent 1.59, 128 s at 30× —
        // tools/scalecheck.json round 10). So this full self-join query
        // lets the adaptive k escape to 4: C(12,4) = 495 combos at 20-bit
        // keys covers 1M docs, explode grows 3× but stays LINEAR while
        // the candidate stage it buys down is the quadratic term. k = 5
        // would add combos without key bits (5·(60÷13) = 20) — 4 is the
        // ceiling of this 60-bit/radius-8 geometry; past 2^20 docs a
        // production deployment widens the signature itself (128-bit
        // pHash in two words). Contrast q_simhash_recall, which keeps
        // k = 1 at this radius: its candidate join is probe-side bounded
        // (doc_a < ProbeDocs pushes into the join), so small buckets buy
        // nothing there. k stays purely physical: pairsWithin is exact
        // for any k, so declared pairs are identical at every k and the
        // small-SF plans (k ≤ 3 below 32k docs) don't move.
        val k = graft.ops.HammingJoin.adaptiveRequiredMatches(
          Dedup.docCount(s, d), Bits, MaxDist, maxK = 4)
        graft.ops.HammingJoin.pairsWithin(
            sig, "doc_id", "sig", Bits, MaxDist, k)
          .orderBy("doc_a", "doc_b")
    }
  )

}
