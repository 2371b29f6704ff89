package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for pretraining-data preparation: lay the corpus out as
  * one virtual token stream in a deterministic document order and split it
  * into fixed-`budget` chunks (context windows). This is GPT-style
  * concat-and-split packing — documents may straddle a chunk boundary; the
  * assignment records where each document starts and how many chunks it
  * touches, which is exactly what a downstream tokenizer/writer needs to
  * emit padded-free training sequences.
  *
  * The interesting part at 100 TB is the GLOBAL running sum. A window
  * `sum() over (order by id)` is the textbook formulation and a scale
  * killer — no partition key means Spark moves the entire corpus to ONE
  * partition. This operator computes the same numbers with the classic
  * two-pass distributed prefix sum instead:
  *
  *   1. range-shuffle rows by the order column (so partition i holds a
  *      contiguous id range, sorted within) — the ONE full exchange, same
  *      price as any global sort;
  *   2. first pass: per-partition weight totals — P longs to the driver
  *      (bounded by partition count, never rows);
  *   3. second pass: each partition starts from the broadcast exclusive
  *      prefix of the totals before it and walks its rows locally.
  *
  * Determinism contract: `orderCol` must be unique (a pk). Range partition
  * BOUNDS are sampled and can vary run to run, but the prefix sum is
  * boundary-independent — moving a row to the neighboring partition moves
  * the same weight between the two partials — so the output is a pure
  * function of the data (oracle-checkable bit-for-bit against a window-SQL
  * mirror).
  */
object Packing {

  /** Assign each row its chunk placement under concat-and-split packing.
    * Output: (<idCol>, <weightCol as long>, chunk, chunk_offset, n_chunks)
    * where `chunk` is the chunk the row starts in, `chunk_offset` its
    * position within that chunk, and `n_chunks` how many chunks it spans
    * (0 for zero-weight rows, which occupy no stream positions). Join back
    * on the id to re-attach payload columns. */
  def concatSplitAssign(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val slim = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
    val rdd = slim.rdd
    // a sorted-RDD cache makes pass 2 reuse pass 1's shuffle output instead
    // of re-shuffling the corpus
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals — one long per partition to the driver
    val partTotals = rdd.mapPartitionsWithIndex { (pi, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator((pi, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bOff = spark.sparkContext.broadcast(offsets)
    // pass 2: local walk from the partition's exclusive global prefix
    val outSchema = StructType(Seq(
      idField.copy(name = idCol),
      StructField(weightCol, LongType, nullable = false),
      StructField("chunk", LongType, nullable = false),
      StructField("chunk_offset", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false)))
    val packed = rdd.mapPartitionsWithIndex { (pi, it) =>
      var cum = bOff.value(pi)
      it.map { r =>
        val w = r.getLong(1)
        val start = cum / budget
        val off = cum % budget
        val spans = if (w == 0L) 0L else (cum + w - 1) / budget - start + 1
        cum += w
        Row(r.get(0), w, start, off, spans)
      }
    }
    val out = spark.createDataFrame(packed, outSchema)
    // materializing out consumes the cache exactly twice (pass 1 ran once);
    // leave unpersist to the context cleaner — an eager unpersist here
    // would drop blocks before the caller's action runs
    out
  }

  /** Chunk-level summary of a packing: rows-started, total weight resident,
    * and the ragged tail, per chunk. `weight_in_chunk` counts a straddling
    * document's tokens in EVERY chunk it crosses, so each full chunk sums
    * to exactly `budget` — the invariant a sequence writer relies on. */
  def chunkSummary(assign: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val weightCol = assign.columns(1)
    // explode each row across the chunks it spans with its per-chunk share:
    // first chunk gets min(w, budget - offset), middle chunks budget, the
    // last chunk the remainder
    val spans = assign.filter(col("n_chunks") > 0)
      .select(col("chunk"), col("chunk_offset"), col("n_chunks"),
        col(weightCol).as("__w"))
      .withColumn("__i", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("__share",
        when(col("n_chunks") === 1, col("__w"))
          .when(col("__i") === 0, lit(budget) - col("chunk_offset"))
          .when(col("__i") === col("n_chunks") - 1,
            col("__w") - (lit(budget) - col("chunk_offset"))
              - (col("n_chunks") - 2) * budget)
          .otherwise(lit(budget)))
    spans.groupBy((col("chunk") + col("__i")).as("chunk"))
      .agg(sum(when(col("__i") === 0, 1L).otherwise(0L)).as("n_docs_start"),
        sum(col("__share")).as("weight_in_chunk"))
  }
}
