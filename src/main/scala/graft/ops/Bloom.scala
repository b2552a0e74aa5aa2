package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Bloom filter for join-free membership pre-filtering.
  *
  * The 100 TB motivation: decontamination / URL-blocklist / seen-ID
  * checks are anti-joins of the corpus against a reference set. When
  * the reference set is too big to broadcast as rows but its BITS fit
  * (1e9 grams ≈ 1.2 GB at 1% FP), a Bloom filter turns the shuffle
  * join into a narrow map-side probe; only the bloom-POSITIVE sliver
  * (true hits + FP rate) continues to the exact check, so the join
  * shuffles orders of magnitude fewer rows.
  *
  * Determinism: probe positions come from double hashing
  * (Kirsch–Mitzenmacher 2006) over this repo's 60-bit md5 —
  * `pos_i = (h1 + i·h2) mod m` — and the build is a bitwise-OR
  * aggregate, so the filter (false positives included) is a set
  * property of the data: partitioning-invariant and exactly
  * reproducible in the DuckDB oracle.
  */
object Bloom {

  import TextOps.{hash60, tokensWs, wordNgrams}

  /** the two probe hashes of a gram column — computed in a codegen'd
    * projection, never as an interpreted aggregate child. */
  def hashes(g: Column): (Column, Column) =
    (hash60(g), hash60(concat(g, lit("#2"))))

  /** build the filter over the DISTINCT word n-grams of `eval`: one
    * aggregation whose state is the m-bit array itself (OR-merge). */
  def buildBits(eval: DataFrame, textCol: String, n: Int,
      mBits: Int, k: Int): Array[Long] = {
    val (h1, h2) = hashes(col("__g"))
    val agg = GraftColumnBridge.column(
      BloomBuild(
        GraftColumnBridge.expression(col("__h1")),
        GraftColumnBridge.expression(col("__h2")), mBits, k)
        .toAggregateExpression())
    eval
      .select(explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .distinct()
      .select(h1.as("__h1"), h2.as("__h2"))
      .agg(agg.as("bits"))
      .collect().head.getSeq[Long](0).toArray
  }

  /** membership probe column (compiled; the bit array rides along as
    * a reference object — the broadcast payload). */
  def probe(h1: Column, h2: Column, bits: Array[Long], mBits: Int,
      k: Int): Column =
    GraftColumnBridge.column(BloomProbe(
      GraftColumnBridge.expression(h1),
      GraftColumnBridge.expression(h2), bits, mBits, k))

  /** Two-phase decontamination demonstrator: per corpus doc, how many
    * of its distinct n-grams are bloom-POSITIVE vs how many are
    * exact eval hits. n_bloom ⊇ n_exact always (no false negatives);
    * the gap is the FP traffic the exact phase still has to verify.
    * Production path: probe-filter first (narrow, no shuffle), exact
    * join only the positives. */
  def bloomDecontaminate(corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      mBits: Int = 4096, k: Int = 3): DataFrame = {
    val bits = buildBits(eval, textCol, n, mBits, k)
    val evalGrams = broadcast(eval
      .select(explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1)))
    val (h1, h2) = hashes(col("__g"))
    Partitioning.spread(corpus)
      .select(col(idCol), explode(wordNgrams(tokensWs(col(textCol)), n))
        .as("__g"))
      .distinct()
      .withColumn("__bp", probe(h1, h2, bits, mBits, k))
      .join(evalGrams, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(when(col("__bp"), lit(1))).as("n_bloom"),
        count(when(col("__hit") === 1, lit(1))).as("n_exact"))
  }
}

/** OR-aggregate building an m-bit Bloom filter: state is the
  * `m/64`-word bit array; update sets the k double-hashed positions
  * of one gram, merge is a word-wise OR — order-free, so the filter
  * never depends on partitioning. */
case class BloomBuild(h1: Expression, h2: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a multiple of 64")
  require(k >= 1, "k >= 1")

  private val words = mBits / 64

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val x = a.asInstanceOf[Long]
      val y = b.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val pos = ((x + i.toLong * y) % mBits).toInt
        buffer(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(words * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < words) { out.writeLong(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

/** compiled Bloom membership probe: true iff all k double-hashed
  * positions are set in the carried bit array. */
case class BloomProbe(left: Expression, right: Expression,
    bits: Array[Long], mBits: Int, k: Int) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_probe"

  def compute(x: Long, y: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = ((x + i.toLong * y) % mBits).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
