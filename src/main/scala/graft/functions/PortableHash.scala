package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * MinHash/SimHash need hash functions that an external SQL engine can
  * reproduce bit-for-bit (the correctness oracle re-computes signatures
  * independently). Spark's `hash()`/`xxhash64()` are Spark-specific, so
  * we derive a 60-bit integer from the leading 15 hex digits of MD5 —
  * every engine agrees on MD5 and on hex→int conversion, and 15 hex
  * digits always fit a signed 64-bit int (non-negative).
  *
  * All of this stays inside whole-stage codegen (md5/conv/substring are
  * built-in codegen'd expressions — no UDFs on the hot path).
  */
object PortableHash {

  /** 60-bit non-negative hash of `c` (as string) under `seed`. */
  def phash(c: Column, seed: Int): Column = phashCol(c, lit(seed))

  /** Same with a column-valued seed (for exploded seed sequences). */
  def phashCol(c: Column, seed: Column): Column =
    conv(substring(md5(concat_ws("#", c, seed)), 1, 15), 16, 10)
      .cast("long")

  /** Lowercase hex MD5 fingerprint of a string column. */
  def fingerprint(c: Column): Column = md5(c)

  /** 60-bit non-negative hash of an already-concatenated string —
    * surrogate-id derivation that a DuckDB oracle reproduces as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`. */
  def phashStr(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit base hash (leading 8 hex digits of MD5) — the "hash once,
    * derive k functions" base for MinHash. */
  def phash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Largest 32-bit prime: modulus for the affine MinHash family. */
  val MinhashPrime: Long = 4294967291L

  /** Deterministic affine coefficients (a_i, b_i) for seed i.
    * a_i ∈ [1, 2^31) keeps a·h0 + b < 2^63: no 64-bit overflow on any
    * engine (and no ANSI overflow error in Spark). */
  def minhashCoeffs(i: Int): (Long, Long) = {
    val a = (2654435761L * (i + 1) + 1) % 2147483647L
    val b = (40503L * 65537L * (i + 1) + 17) % MinhashPrime
    (if (a == 0) 1L else a, b)
  }
}
