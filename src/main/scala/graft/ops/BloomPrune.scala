package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter pre-pruning for selective joins.
  *
  * At 100 TB the dominant cost of `fact SEMI JOIN keys` is shuffling every
  * fact row into the join exchange even though only a few percent survive.
  * A bloom filter of the key side lets a map-side filter drop most
  * non-matching rows *before* the shuffle; the exact join afterwards
  * removes the bloom's false positives, so the result is bit-identical to
  * the plain join (which is what the DuckDB oracle checks).
  *
  * Shape: the same two-step protocol as Spark's own runtime row-level
  * bloom ("spark.sql.optimizer.runtime.bloomFilter") — (1) a tiny
  * aggregation sketches the key side, (2) the sketch re-enters the main
  * query as a LITERAL in a scalar predicate. Step 2 is deliberately NOT a
  * join: a join-shaped probe gets rewritten by Catalyst's semi-join
  * pushdown (`PushDownLeftSemiAntiJoin` + `PushLeftSemiLeftAntiThroughJoin`
  * reorder it to run the semi join first), silently undoing the
  * pre-shuffle pruning. A literal predicate instead gets pushed DOWN
  * toward the scan — exactly where it belongs. PlanAuditSpec pins this.
  *
  * Representation: `map<int, bigint>` of non-zero 64-bit words — m=2^20
  * bits is at most 16,384 entries (~256 KB) as ONE literal object (no
  * per-entry codegen), and sparse key sets pay only for words they touch.
  * The build is a partial-aggregable `bit_or` per word; the sketch
  * collected to the driver is the one-row aggregate result (a sketch, not
  * data — same class as a broadcast build side). The probe is pure
  * codegen'd column arithmetic (xxhash64 + shift + mask) — no UDF.
  */
object BloomPrune {

  /** Per-seed bit position of `key` in an m-bit filter. */
  private def bitPos(key: Column, seed: Int, mBits: Int): Column =
    pmod(xxhash64(lit(seed), key), lit(mBits.toLong))

  /** One-row bloom bitmap of `keys.keyCol` as `bloom_words: map<int,bigint>`. */
  def buildBloom(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two: $mBits")
    val positions = array((0 until k).map(bitPos(col(keyCol), _, mBits)): _*)
    keys
      .select(explode(positions).as("pos"))
      .select(
        shiftrightunsigned(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("bits")))
        .as("bloom_words"))
  }

  /** Execute the build and return the bitmap as a DENSE word array —
    * mBits/64 longs (128 KB at m=2^20), the runtime-filter "subquery
    * result" that becomes a literal. Dense, not a map: Catalyst map
    * literals have no hash index, so `element_at(map, k)` is a LINEAR
    * scan per probe — measured at ~10x the whole query on a 16k-entry
    * bitmap; `element_at(array, i)` is O(1). */
  def collectBloom(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    val sparse = buildBloom(keys, keyCol, mBits, k)
      .collect()(0).getMap[Int, Long](0)
    val dense = new Array[Long](mBits / 64)
    sparse.foreach { case (w, bits) => dense(w) = bits }
    dense
  }

  /** Probe predicate: all k bits of `key` set in the `bloom` word-array
    * column (pass `typedlit(words.toSeq)`). An untouched word is 0 → a
    * definite miss; no false negatives by construction (every inserted
    * key set exactly these bits). */
  def mightContain(bloom: Column, key: Column, mBits: Int, k: Int): Column =
    (0 until k).map { seed =>
      val pos = bitPos(key, seed, mBits)
      val word = element_at(bloom,
        (shiftrightunsigned(pos, 6) + lit(1L)).cast("int")) // 1-based
      val bit = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)

  /** `fact LEFT SEMI JOIN keys` with a bloom pre-filter: the map phase
    * drops (1 − fpp) of non-matching fact rows before the join exchange,
    * and the exact semi join removes the false positives. Result ≡ the
    * plain semi join. */
  def semiJoinPruned(fact: DataFrame, keys: DataFrame, factKey: String,
      keyCol: String, mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val words = collectBloom(keys, keyCol, mBits, k)
    val pruned = fact.filter(
      mightContain(typedlit(words.toSeq), col(factKey), mBits, k))
    pruned.join(keys.select(col(keyCol).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
  }
}
