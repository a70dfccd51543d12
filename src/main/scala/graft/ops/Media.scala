package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample operators a training-data pipeline needs.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB:
  * [[MediaKernel.decodeStub]] parses a deterministic fake header instead of
  * running a real JPEG/PCM decoder. Everything around it — the binary
  * column schema, the typed batch shape, the mapPartitions kernel boundary,
  * partitioning, and the feature projections — is real Spark plumbing and
  * is tested. A real decoder drops into `decodeStub` without touching the
  * plan.
  *
  * Fake wire format (ASCII so the DuckDB oracle can `decode()` it):
  *   image: "IMG;W=00128;H=00096;" ++ payload[a-p]+
  *   audio: "AUD;R=16000;S=00192;" ++ payload[a-p]+
  */
object Media {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, nBytes: Int)
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte], meta: MediaMeta)
  final case class MediaParsed(doc_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, payload_len: Int)

  /** Deterministic synthetic media row (no wall-clock, no global RNG). */
  def rowFor(i: Long): MediaRow = {
    val rng = new java.util.Random(i * 0x9E3779B97F4A7C15L + 13L)
    val payloadLen = 64 + rng.nextInt(193)
    val payload = Array.fill(payloadLen)(('a' + rng.nextInt(16)).toChar).mkString
    if (i % 2 == 0) {
      val w = 16 + rng.nextInt(2033)
      val h = 16 + rng.nextInt(2033)
      val bytes = (f"IMG;W=$w%05d;H=$h%05d;" + payload).getBytes("UTF-8")
      MediaRow(i, "image", bytes, MediaMeta(w, h, 0, bytes.length))
    } else {
      val sr = Vector(8000, 16000, 22050, 44100)(rng.nextInt(4))
      val bytes = (f"AUD;R=$sr%05d;S=$payloadLen%05d;" + payload).getBytes("UTF-8")
      MediaRow(i, "audio", bytes, MediaMeta(0, 0, sr, bytes.length))
    }
  }

  /** The per-batch decode kernel (mapPartitions over typed rows — the
    * Scala analogue of a `mapInPandas` batch UDF; executors see iterator
    * batches, never one-row calls).
    */
  object MediaKernel {
    /** STUB: a real system would decode the image/audio container here.
      * Deterministic fake = parse the ASCII header.
      */
    def decodeStub(kind: String, media: Array[Byte]): MediaParsed = {
      val s = new String(media, "UTF-8")
      val headerLen = s.indexOf(';', s.indexOf(';', 4) + 1) + 1
      val payloadLen = s.length - headerLen
      kind match {
        case "image" =>
          MediaParsed(-1L, kind, s.substring(6, 11).toInt, s.substring(14, 19).toInt, 0, payloadLen)
        case _ =>
          MediaParsed(-1L, kind, 0, 0, s.substring(6, 11).toInt, payloadLen)
      }
    }
  }

  /** Metadata extraction through the typed kernel (binary -> parsed). */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaParsed] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      MediaKernel.decodeStub(r.kind, r.media).copy(doc_id = r.doc_id)
    })
  }

  def extractMetaSql(parquetGlob: String): String =
    s"""SELECT doc_id, kind,
       |  CASE WHEN kind = 'image' THEN CAST(substring(decode(media), 7, 5) AS INT) ELSE 0 END AS width,
       |  CASE WHEN kind = 'image' THEN CAST(substring(decode(media), 15, 5) AS INT) ELSE 0 END AS height,
       |  CASE WHEN kind = 'audio' THEN CAST(substring(decode(media), 7, 5) AS INT) ELSE 0 END AS sample_rate,
       |  CAST(length(decode(media)) - 20 AS INT) AS payload_len
       |FROM read_parquet('$parquetGlob') ORDER BY doc_id""".stripMargin

  val Alphabet: Seq[Char] = 'a' to 'p'

  /** Feature extraction: 16-bin byte histogram over the payload — the
    * deterministic stand-in for an embedding/feature extractor; a pure
    * column projection (codegen, no shuffle).
    */
  def byteHistogram(media: DataFrame): DataFrame = {
    val s = col("media").cast("string")
    val payload = regexp_extract(s, ";([a-p]+)$", 1)
    val features = concat_ws(",", Alphabet.map(c =>
      (length(payload) - length(regexp_replace(payload, c.toString, ""))).cast("int").cast("string")): _*)
    media.select(col("doc_id"), col("kind"), features.as("features"))
      .orderBy("doc_id")
  }

  def byteHistogramSql(parquetGlob: String): String = {
    val feats = Alphabet.map(c =>
      s"CAST(length(payload) - length(replace(payload, '$c', '')) AS INT)")
      .mkString("array_to_string([", ", ", "], ',')")
    s"""SELECT doc_id, kind, $feats AS features
       |FROM (SELECT doc_id, kind, regexp_extract(decode(media), ';([a-p]+)$$', 1) AS payload
       |      FROM read_parquet('$parquetGlob'))
       |ORDER BY doc_id""".stripMargin
  }

  /** Frame sampling: every k-th payload byte (video-frame-sample analogue). */
  def frameSample(media: DataFrame, k: Int = 8): DataFrame = {
    val s = col("media").cast("string")
    val payload = regexp_extract(s, ";([a-p]+)$", 1)
    val sampled = when(length(payload) >= k,
        concat_ws("", transform(
          sequence(lit(1), floor(length(payload) / lit(k)).cast("int")),
          i => payload.substr((i - lit(1)) * lit(k) + lit(1), lit(1)))))
      .otherwise(lit(""))
    media.select(col("doc_id"), sampled.as("frames")).orderBy("doc_id")
  }

  def frameSampleSql(parquetGlob: String, k: Int = 8): String =
    s"""SELECT doc_id,
       |  CASE WHEN length(payload) >= $k THEN array_to_string(
       |    list_transform(generate_series(1, CAST(floor(length(payload) / $k) AS INT)),
       |      i -> substring(payload, (i-1)*$k + 1, 1)), '')
       |  ELSE '' END AS frames
       |FROM (SELECT doc_id, regexp_extract(decode(media), ';([a-p]+)$$', 1) AS payload
       |      FROM read_parquet('$parquetGlob'))
       |ORDER BY doc_id""".stripMargin
}
