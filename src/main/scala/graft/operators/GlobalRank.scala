package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Total-order ranking without the single-partition window collapse.
  *
  * `Window.orderBy(...)` with no partition key sends EVERY row to one
  * partition (Spark itself warns "No Partition Defined for Window operation
  * ... serious performance degradation") — a non-starter at 100 TB. These
  * operators compute the same global `row_number` / `ntile` the scalable
  * way, mirroring how a distributed sort works:
  *
  *  1. `repartitionByRange` on the sort key (sampled range bounds — the
  *     exchange Spark plans for any global `orderBy`), sort within
  *     partitions → globally sorted across partition index order;
  *  2. one count per partition to the driver (#partitions longs, not rows);
  *  3. per-partition rank = partition offset + local position.
  *
  * The data never converges on one node; the only driver traffic is the
  * per-partition counts.
  *
  * '''Total-order requirement.''' The caller MUST supply `sortCols` that
  * form a total order (tie-broken to uniqueness, e.g. by appending a unique
  * id). Both passes run over ONE RDD object, so Spark's shuffle-stage reuse
  * pins the range bounds and the row→partition assignment — but within a
  * partition, rows that compare EQUAL under `sortCols` have no defined
  * relative order, and a task recomputed after executor loss may legally
  * emit them in a different order than the first pass observed. With a total
  * order the intra-partition sort is bitwise deterministic and the two
  * passes (and any recompute) agree exactly.
  *
  * '''Cache posture.''' The sorted stream is deliberately NOT persisted:
  * the second pass re-reads the (already written) shuffle files and redoes
  * the partition-local sort, which at 100 TB is far cheaper than
  * materializing the whole corpus to executor memory/disk for one extra
  * pass — and it leaves no persisted footprint behind the operator
  * (PlanSpec-asserted via `getPersistentRDDs`).
  */
object GlobalRank {

  /** Appends a 1-based global row number column `out` under the total order
    * `sortCols`. One range exchange + one pass; rows stay distributed. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
      numPartitions: Option[Int] = None): DataFrame =
    ranked(df, sortCols, out, numPartitions)._1

  /** Appends an `out` column with the SQL `ntile(buckets)` assignment under
    * the total order `sortCols`: rows split into `buckets` contiguous groups,
    * the first `n % buckets` groups one row larger — identical semantics to
    * `ntile(k) OVER (ORDER BY ...)` but without the single-partition plan. */
  def withNtile(df: DataFrame, buckets: Int, sortCols: Seq[Column], out: String,
      numPartitions: Option[Int] = None): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val (rowNumbered, total) = ranked(df, sortCols, "_grank", numPartitions)
    val base = total / buckets     // small-bucket size
    val rem = total % buckets      // #buckets of size base+1 (they come first)
    val cut = rem * (base + 1)     // rank0 below this → a big bucket
    val rank0 = col("_grank") - 1
    val tile = when(rank0 < cut, rank0.cast("long") / (base + 1))
      // greatest() guards base=0 (total < buckets): then cut == total and
      // every row takes the first branch, but both branches are codegen'd.
      .otherwise(lit(rem) + (rank0 - cut).cast("long") / math.max(base, 1L))
    rowNumbered.withColumn(out, (tile + 1).cast("long")).drop("_grank")
  }

  /** Appends the GLOBAL running total of `valueCol` (inclusive of the
    * current row) under the total order `sortCols` — the distributed
    * prefix-sum: `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`
    * without the single-partition window. Same two-pass shape as
    * [[withRowNumber]]: range exchange + per-partition VALUE sums to the
    * driver (#partitions longs) + per-partition local prefix + offset.
    * Foundation for sequence packing, size-balanced sharding, and any
    * cumulative cut-point assignment over a 100 TB order. */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      out: String, numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val tagged = df.withColumn("_gsum_v", coalesce(valueCol.cast("long"), lit(0L)))
    val sorted = tagged.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("_gsum_v")
    // ONE RDD object for both passes: the second job skips the shuffle-write
    // stage and re-reads the same map output, so both passes see identical
    // range bounds and partition contents (no persist needed — see the
    // object scaladoc's cache-posture note). InternalRow grain throughout
    // (round 17): `.rdd` boxed every field to external Rows and
    // createDataFrame re-encoded them back — two full ser/de passes whose
    // only product was the appended long.
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var s = 0L; while (it.hasNext) { s += it.next().getLong(vIdx) }; s
      })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val withSum = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      val append = appendField(schema)
      it.map { r => acc += r.getLong(vIdx); append(r, acc) }
    }
    org.apache.spark.sql.graft.ColumnBridge
      .internalCreateDataFrame(spark, withSum, schema).drop("_gsum_v")
  }

  /** Per-partition InternalRow appender: joins each row with ONE extra
    * trailing field and projects to an UnsafeRow under `schema` (reused
    * buffer — the standard operator iterator contract; downstream
    * operators copy when they buffer). Call INSIDE the partition closure:
    * the generated projection is not serializable. */
  private def appendField(schema: StructType)
      : (org.apache.spark.sql.catalyst.InternalRow, Any) => org.apache.spark.sql.catalyst.InternalRow = {
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    (r, v) => { extra.update(0, v); proj(joined(r, extra)) }
  }

  /** Appends the GLOBAL running maximum of `valueCol` (inclusive of the
    * current row) under the total order `sortCols` — `max(v) OVER (ORDER
    * BY ... ROWS UNBOUNDED PRECEDING)` without the single-partition
    * window. Max is associative like sum, so the [[withRunningSum]]
    * two-pass shape transfers verbatim: range exchange + per-partition
    * MAXES to the driver (#partitions longs) + per-partition local
    * prefix-max seeded with the prefix of earlier partitions' maxes.
    * NULL values are treated as no-ops (the running max passes through);
    * rows before any non-null value carry NULL. Foundation for
    * watermark/lateness audits (how far behind the high-water mark each
    * event arrives) and any high-water-mark dataflow over a 100 TB order.
    */
  def withRunningMax(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      out: String, numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val tagged = df.withColumn("_gmax_v", valueCol.cast("long"))
    val sorted = tagged.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("_gmax_v")
    // ONE RDD object for both passes (see withRunningSum's scaladoc note);
    // InternalRow grain throughout (round 17, same rationale).
    val rdd = sorted.queryExecution.toRdd
    val maxes = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var m = Long.MinValue
        while (it.hasNext) { val r = it.next(); if (!r.isNullAt(vIdx)) m = math.max(m, r.getLong(vIdx)) }
        m
      })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = maxes.scanLeft(Long.MinValue)(math.max)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = true))
    val withMax = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      val append = appendField(schema)
      it.map { r =>
        if (!r.isNullAt(vIdx)) acc = math.max(acc, r.getLong(vIdx))
        append(r, if (acc == Long.MinValue) null else acc)
      }
    }
    org.apache.spark.sql.graft.ColumnBridge
      .internalCreateDataFrame(spark, withMax, schema).drop("_gmax_v")
  }

  /** Shared core: returns (df + rank column, total row count). */
  private def ranked(df: DataFrame, sortCols: Seq[Column], out: String,
      numPartitions: Option[Int]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    // ONE RDD object for both passes: a re-optimized second DataFrame
    // execution could legally sample different range bounds, but two jobs
    // over the SAME RDD reuse the shuffle-write stage (it is skipped, the
    // map output re-read), so the count pass and the rank-assignment pass
    // see identical partitioning without persisting anything. InternalRow
    // grain throughout (round 17, see withRunningSum).
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val withIdx = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = bc.value(i)
      val append = appendField(schema)
      it.map { r => k += 1; append(r, k) }
    }
    (org.apache.spark.sql.graft.ColumnBridge
      .internalCreateDataFrame(spark, withIdx, schema), offsets.last)
  }
}
