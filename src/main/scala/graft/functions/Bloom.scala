package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{lit, xxhash64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Driver-held Bloom sketch over a key column, for scan-level
  * membership prefilters — the explicit form of Spark's own runtime
  * bloom-filter join pruning (`InjectRuntimeFilter`), built from the
  * same two Catalyst expressions it injects (`BloomFilterAggregate`,
  * `BloomFilterMightContain`), so the probe side stays inside
  * whole-stage codegen with zero UDFs.
  *
  * Scale shape: the sketch is aggregated distributedly (partial
  * bloom per partition, OR-merged — map-side combinable) and only
  * the final `numBits/8`-byte blob lands on the driver: bounded
  * index metadata, the same policy as the IVF/PQ codebooks. Embedded
  * as a binary literal, it travels with the plan to every executor
  * and filters rows AT THE SCAN, before any exchange — at 100 TB the
  * downstream exact join sees only candidate rows (no false
  * negatives; false positives are removed by the exact confirm).
  */
object Bloom {

  /** Aggregate `keyCol` of `keys` into a serialized Bloom filter.
    * Keys are xxhash64-hashed to longs first (the runtime-filter
    * convention); `mightContain` applies the same hash, so any
    * key type round-trips. Empty input ⇒ empty sketch (matches
    * nothing). */
  def sketch(keys: DataFrame, keyCol: Column,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = keys.select(Bridge.column(agg).as("bf")).head()
    // BloomFilterAggregate yields NULL for zero inserted items.
    if (row.isNullAt(0)) Array.emptyByteArray
    else row.getAs[Array[Byte]](0)
  }

  /** Membership probe of `keyCol` against a sketch from [[sketch]]:
    * false ⇒ definitely absent, true ⇒ candidate. Codegen'd predicate
    * (`BloomFilterMightContain.doGenCode`), pushable to the scan. */
  def mightContain(sketchBytes: Array[Byte], keyCol: Column): Column =
    if (sketchBytes.isEmpty) lit(false)
    else Bridge.column(BloomFilterMightContain(
      Literal.create(sketchBytes, BinaryType),
      Bridge.expression(xxhash64(keyCol))))
}
