package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Membership probe of a PACKED broadcast bitset: `child` is a bit
  * position, the filter is `m/64` long words shipped once per
  * executor via `SparkContext.broadcast` — NOT a plan literal. The
  * Bloom-decontamination hot path (`d15`) previously embedded a
  * 2^20-element boolean-array literal in the plan: ~1 MiB serialized
  * into every task closure, 8 bits per bit, resent with every job the
  * plan participates in. The packed broadcast form is 16× smaller
  * (128 KiB at m=2^20), fetched once per executor and cached by the
  * block manager, and the probe codegens to two shifts and a mask —
  * the shape that stays polite when m grows with a
  * billions-of-entries blocklist (m=2^33 is a 1 GiB broadcast, vs an
  * un-shippable 8 GiB boolean literal).
  *
  * Null in → null out (the filter drops it, matching the semi-join
  * the Bloom pass fronts). Positions must lie in [0, 64·words.length).
  */
case class BloomBitsetProbe(child: Expression, bits: Broadcast[Array[Long]])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_bitset_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_bitset_probe requires BIGINT position, got ${t.sql}")
  }

  override protected def nullSafeEval(pos: Any): Any = {
    val p = pos.asInstanceOf[Long]
    ((bits.value((p >>> 6).toInt) >>> (p & 63L)) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bits,
      classOf[Broadcast[_]].getName)
    // one broadcast fetch per operator instance, not per row
    val arr = ctx.addMutableState("long[]", "bloomBits",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = (($arr[(int)($p >>> 6)] >>> ($p & 63L)) & 1L) == 1L;")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBitsetProbe =
    copy(child = newChild)
}

/** All-k Bloom membership in ONE predicate: `child` is the element
  * HASH (not a position); the k affine probe positions
  * `((a_i·h + b_i) mod p) mod m` are derived inside the expression and
  * tested against the packed broadcast bitset with short-circuit AND.
  *
  * Why not `probe(p0) && probe(p1) && probe(p2)` over a projected
  * hash column: Catalyst pushes the conjunction through the
  * projection that computes `h`, substituting the hash expression
  * into EVERY conjunct — a corpus-scan filter whose hash is an
  * md5+conv chain then pays the chain 3× per row (plus once more
  * above the filter for survivors). One fused predicate references
  * `h` once, so the pushed-down filter evaluates the chain once per
  * row, and misses short-circuit on the first clear bit.
  */
case class BloomBitsetProbeK(child: Expression, seeds: Seq[(Long, Long)],
    p: Long, m: Long, bits: Broadcast[Array[Long]])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_bitset_probe_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if seeds.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case LongType => TypeCheckResult.TypeCheckFailure(
      "bloom_bitset_probe_k requires at least one probe seed")
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_bitset_probe_k requires BIGINT hash, got ${t.sql}")
  }

  override protected def nullSafeEval(hash: Any): Any = {
    val h = hash.asInstanceOf[Long]
    val w = bits.value
    seeds.forall { case (a, b) =>
      val pos = (a * h + b) % p % m
      ((w((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 1L
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bits,
      classOf[Broadcast[_]].getName)
    val arr = ctx.addMutableState("long[]", "bloomBitsK",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, h => {
      val pos = ctx.freshName("pos")
      val tests = seeds.zipWithIndex.map { case ((a, b), i) =>
        val pv = s"${pos}_$i"
        s"""long $pv = (${a}L * $h + ${b}L) % ${p}L % ${m}L;
           |if (${ev.value} && ((($arr[(int)($pv >>> 6)]) >>> ($pv & 63L)) & 1L) != 1L) {
           |  ${ev.value} = false;
           |}""".stripMargin
      }.mkString("\n")
      s"""${ev.value} = true;
         |$tests""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBitsetProbeK =
    copy(child = newChild)
}

object BloomBitsetProbe {
  /** Column-API entry: probe `pos` against the packed broadcast set. */
  def probe(pos: Column, bits: Broadcast[Array[Long]]): Column =
    ColumnBridge.column(BloomBitsetProbe(ColumnBridge.expression(pos), bits))

  /** Fused k-probe membership of hash column `h` (see
    * [[BloomBitsetProbeK]]). */
  def probeK(h: Column, seeds: Seq[(Long, Long)], p: Long, m: Long,
      bits: Broadcast[Array[Long]]): Column =
    ColumnBridge.column(
      BloomBitsetProbeK(ColumnBridge.expression(h), seeds, p, m, bits))

  /** Pack bit positions into the m/64-word set (m must be a multiple
    * of 64; the word array is JVM-bounded at m ≤ 2^37, i.e. a 16 GiB
    * bitset — the broadcast layer gives out long before that). */
  def pack(m: Long, positions: Iterator[Long]): Array[Long] = {
    val words = allocWords(m)
    positions.foreach { p =>
      require(p >= 0 && p < m, s"bit position $p outside [0, $m)")
      words((p >>> 6).toInt) |= 1L << (p & 63L)
    }
    words
  }

  private def allocWords(m: Long): Array[Long] = {
    require(m > 0 && m % 64 == 0, s"bitset size $m not a multiple of 64")
    require((m >> 6) <= Int.MaxValue.toLong,
      s"bitset size $m exceeds the JVM array bound (max 2^37 bits)")
    new Array[Long]((m >> 6).toInt)
  }

  /** DISTRIBUTED fill: OR-fold a DataFrame of bit positions (one
    * BIGINT column) into the packed word array, executor-side. Each
    * partition packs its own words and the partials merge up a
    * 2-level tree — no position row ever reaches the driver, which is
    * what the billions-of-entries blocklist case needs (a driver
    * collect of ~k·|blocklist| positions breaks long before the
    * packed broadcast does; the only driver-sized object here is the
    * final m/8-byte array itself, the same thing being broadcast).
    * Duplicate positions are free (OR is idempotent), so callers skip
    * the distinct-shuffle a row-collect needed. Partials are
    * allocated lazily per partition (the zero is null), so the job
    * ships no m-sized closure. */
  def packDistributed(m: Long, positions: org.apache.spark.sql.DataFrame)
      : Array[Long] = {
    val mb = m // avoid capturing `this` in the task closure
    val words = positions.queryExecution.toRdd.treeAggregate(null: Array[Long])(
      (acc, row) => {
        val w = if (acc == null) allocWords(mb) else acc
        val p = row.getLong(0)
        require(p >= 0 && p < mb, s"bit position $p outside [0, $mb)")
        w((p >>> 6).toInt) |= 1L << (p & 63L)
        w
      },
      (a, b) =>
        if (a == null) b
        else if (b == null) a
        else {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    if (words == null) allocWords(m) else words
  }
}
