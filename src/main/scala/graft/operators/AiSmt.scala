package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** AI-adjacent SMTs — the Spark re-expression of the reference's AI
  * module: append an embedding of a chosen field
  * (`debezium-ai/debezium-ai-embeddings/src/main/java/io/debezium/ai/embeddings/FieldToEmbedding.java:51`)
  * and parse/chunk a document field
  * (`debezium-ai/debezium-ai-docling/.../FieldToDocling.java`).
  *
  * The MODEL is a clearly-marked deterministic fake (same policy as
  * `tdp/Multimodal`'s codec): a hash-projection embedding — component d is
  * a uniform value in [-1, 1) derived from md5(d || '|' || text) — and a
  * fixed-window chunker. The Spark-side plumbing is the real deliverable:
  * a codegen'd narrow projection per record (no UDF, no model server in
  * the hot path), an exploded chunk table with provenance, and both
  * reproducible enough that a SQL oracle computes identical values. A real
  * deployment swaps `hashEmbedding` for a `mapInPandas`/external-endpoint
  * stage with the SAME dataframe contract.
  */
object AiSmt {

  /** FAKE MODEL (deterministic): dims-dimensional hash-projection
    * embedding of a string column. Component d =
    * hex64(md5(d||'|'||text)[0,8)) / 2^31 - 1 ∈ [-1, 1), optionally
    * L2-normalized. Pure codegen'd built-ins; bit-identical in DuckDB via
    * ('0x' || substr(md5(...), 1, 8))::BIGINT.
    */
  def hashEmbedding(c: Column, dims: Int = 16, normalize: Boolean = true): Column = {
    val comps = (0 until dims).map { d =>
      conv(substring(md5(concat(lit(s"$d|"), c)), 1, 8), 16, 10)
        .cast("long").cast("double") / 2147483648.0 - 1.0
    }
    val arr = array(comps: _*)
    if (!normalize) arr
    else {
      val n = sqrt(aggregate(arr, lit(0.0), (acc, x) => acc + x * x))
      transform(arr, x => x / n)
    }
  }

  /** FieldToEmbedding: append `outCol` = embedding(field). The record
    * shape is otherwise untouched, so this composes with the envelope
    * pipeline like any SMT (unwrap → embed → sink).
    */
  def fieldToEmbedding(
      df: DataFrame,
      field: String,
      outCol: String = "embedding",
      dims: Int = 16,
      normalize: Boolean = true): DataFrame =
    df.withColumn(outCol, hashEmbedding(col(field), dims, normalize))

  // ------------------------------------------------------------------
  // Pluggable embedding-model SPI (round-5, VERDICT item 3) — mirrors
  // the reference's factory seam: `EmbeddingsModelFactory`
  // (debezium-ai/debezium-ai-embeddings/src/main/java/io/debezium/ai/
  // embeddings/EmbeddingsModelFactory.java:21-29 — getConfigFields /
  // configure / validateConfiguration / getModel, resolved by SPI inside
  // the `FieldToEmbedding` SMT, FieldToEmbedding.java) with per-batch
  // inference (the reference embeds each Connect record's field through
  // the loaded model; a Spark deployment batches per partition). The
  // in-sandbox implementations are deterministic fakes — no model
  // runtime exists here — but the SEAM is the real deliverable: a
  // LangChain4j/ONNX/HTTP-endpoint model drops in as one more
  // [[ModelFactory]] without touching the pipeline.
  // ------------------------------------------------------------------

  /** A loaded embedding model: batched inference, one call per grouped
    * batch of `batchSize` texts (the `mapPartitions` unit — exactly the
    * shape a remote endpoint or ONNX session wants). Must be
    * deterministic per input for replay/exactly-once semantics; must be
    * serializable (it ships to executors).
    */
  trait EmbeddingModel extends Serializable {
    def dims: Int
    def embed(batch: Seq[String]): Seq[Array[Double]]
  }

  /** Factory SPI: validates its config slice and builds the model.
    * Mirrors EmbeddingsModelFactory's configure → validate → getModel
    * life cycle, collapsed to idiomatic Scala (config is immutable).
    */
  trait ModelFactory extends Serializable {
    def name: String
    /** Throw IllegalArgumentException on bad config (validateConfiguration analog). */
    def validate(config: Map[String, String]): Unit = ()
    def model(config: Map[String, String]): EmbeddingModel
  }

  /** Config keys (the `field.to.embedding.*` namespace analog). */
  object ModelConfig {
    val Model = "embedding.model" // factory name, default "hash"
    val Dims = "embedding.dims" // default 16
    val Normalize = "embedding.normalize" // default true
    val BatchSize = "embedding.batch.size" // default 32
    def dims(c: Map[String, String]): Int = c.getOrElse(Dims, "16").toInt
    def normalize(c: Map[String, String]): Boolean =
      c.getOrElse(Normalize, "true").toBoolean
    def batchSize(c: Map[String, String]): Int = c.getOrElse(BatchSize, "32").toInt
  }

  /** The in-sandbox default: the SAME deterministic hash-projection as
    * [[hashEmbedding]], computed in the JVM — bit-identical to the
    * codegen'd column (spec-asserted), so swapping the column path for
    * the SPI path changes nothing observable.
    */
  object HashModelFactory extends ModelFactory {
    val name = "hash"
    override def validate(config: Map[String, String]): Unit =
      require(ModelConfig.dims(config) > 0, s"${ModelConfig.Dims} must be positive")
    def model(config: Map[String, String]): EmbeddingModel = new EmbeddingModel {
      private val d = ModelConfig.dims(config)
      private val norm = ModelConfig.normalize(config)
      def dims: Int = d
      def embed(batch: Seq[String]): Seq[Array[Double]] = batch.map { text =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val arr = Array.tabulate(d) { i =>
          md.reset()
          val hex = md.digest(s"$i|$text".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .take(4).map(b => f"${b & 0xff}%02x").mkString
          java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
        }
        if (!norm) arr
        else {
          // same fold order as functions.aggregate in hashEmbedding —
          // double addition is order-sensitive and the parity is bitwise
          val n = math.sqrt(arr.foldLeft(0.0)((acc, x) => acc + x * x))
          arr.map(_ / n)
        }
      }
    }
  }

  /** A second fake model (distinct outputs — proves the seam actually
    * switches models): component i = normalized unigram-hash frequency,
    * a bag-of-words projection.
    */
  object UnigramModelFactory extends ModelFactory {
    val name = "unigram"
    def model(config: Map[String, String]): EmbeddingModel = new EmbeddingModel {
      private val d = ModelConfig.dims(config)
      def dims: Int = d
      def embed(batch: Seq[String]): Seq[Array[Double]] = batch.map { text =>
        val arr = new Array[Double](d)
        text.split("\\W+").filter(_.nonEmpty).foreach { w =>
          arr(math.floorMod(w.hashCode, d)) += 1.0
        }
        val n = math.sqrt(arr.foldLeft(0.0)((acc, x) => acc + x * x))
        if (n == 0.0) arr else arr.map(_ / n)
      }
    }
  }

  /** The factory registry (the SPI-resolution analog of the reference's
    * `ServiceLoader` lookup in FieldToEmbedding).
    */
  val modelFactories: Map[String, ModelFactory] =
    Seq(HashModelFactory, UnigramModelFactory).map(f => f.name -> f).toMap

  /** FieldToEmbedding through the MODEL SPI: resolve the factory from
    * config, validate, and run batched per-partition inference. The
    * dataframe contract is identical to [[fieldToEmbedding]] (append
    * `outCol: array<double>`); with the default "hash" model the VALUES
    * are identical too. Scale shape: one narrow mapPartitions, batches of
    * `embedding.batch.size` — no shuffle, no driver round-trips; output
    * is batch-size-invariant by contract (spec-asserted).
    */
  def fieldToEmbeddingSpi(
      df: DataFrame,
      field: String,
      outCol: String = "embedding",
      config: Map[String, String] = Map.empty): DataFrame = {
    val modelName = config.getOrElse(ModelConfig.Model, "hash")
    val factory = modelFactories.getOrElse(modelName,
      throw new IllegalArgumentException(
        s"unknown ${ModelConfig.Model} '$modelName'; " +
          s"have ${modelFactories.keys.mkString(", ")}"))
    factory.validate(config)
    val model = factory.model(config)
    val batchSize = ModelConfig.batchSize(config)
    val idx = df.schema.fieldIndex(field)
    val outSchema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // NULL text → an array of NULL components, matching the codegen
        // column twin exactly (each component is md5(concat(..., null))
        // = null, so hashEmbedding yields array(null × dims), not a null
        // array) — the bit-identity contract covers null rows too, not
        // just the non-null corpus
        val texts = batch.map(r => Option(r.getString(idx)).getOrElse(""))
        val vecs = model.embed(texts)
        val nullVec: Seq[Any] = Seq.fill(model.dims)(null)
        batch.lazyZip(vecs).map((r, v) =>
          Row.fromSeq(r.toSeq :+ (if (r.isNullAt(idx)) nullVec else v.toSeq)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** FieldToDocling analog: segment a document field into fixed-width
    * chunks (the fake "parser"), one output row per chunk with provenance
    * (`chunk_idx`, `chunk_chars`). Real chunking-for-embeddings shape:
    * explode stays narrow (no shuffle), ordering is deterministic.
    */
  def fieldToChunks(df: DataFrame, field: String, maxLen: Int = 120): DataFrame = {
    val len = length(col(field))
    val n = greatest(ceil(len.cast("double") / maxLen).cast("int"), lit(1))
    val chunks = transform(sequence(lit(0), n - 1),
      i => col(field).substr(i * maxLen + 1, lit(maxLen)))
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_chars", length(col("chunk")))
  }
}
