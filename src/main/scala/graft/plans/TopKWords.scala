package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate over `(ord: bigint, word: string)` pairs: the
  * STRING-keyed sibling of [[TopKPairs]] — keeps the `k` smallest pairs
  * under the lexicographic `(ord asc, word asc)` order, where the word
  * comparison is binary UTF-8 (`UTF8String.compareTo` ≡ DuckDB's default
  * binary VARCHAR collation, so the tie law replays exactly in the
  * oracle). This is the term-ranking tail: ids in the other tiers are
  * doc longs, but query-expansion ranks TERMS, and mapping terms to
  * surrogate longs would either break the cross-engine tie law (hash
  * order) or need a dictionary pass. Same scale contract as every
  * bounded tail here: the buffer never exceeds k pairs, map tasks
  * partial-fold their slices, the shuffle ships (#tasks × k) pairs per
  * group — a window form would sort every candidate term of a hot query
  * in one task.
  *
  * Result: `array<struct<ord: bigint, word: string>>` sorted ascending —
  * element i (1-based) is exactly the row the window form would rank i.
  * Null ord/word inputs are skipped (never produced by the callers).
  */
case class TopKWords(
    ord: Expression,
    word: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, UTF8String)]] {

  require(k > 0, s"topk_words requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && word.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_words expects (bigint, string), got " +
        s"(${ord.dataType.sql}, ${word.dataType.sql})")

  // max-heap on (ord, word): peek() is the WORST kept pair
  override def createAggregationBuffer()
      : java.util.PriorityQueue[(Long, UTF8String)] =
    new java.util.PriorityQueue[(Long, UTF8String)](
      math.min(k, 16) + 1, TopKWords.DescOrder)

  private def insert(buf: java.util.PriorityQueue[(Long, UTF8String)],
      o: Long, w: UTF8String): Unit =
    if (buf.size < k) buf.offer((o, w))
    else {
      val worst = buf.peek()
      if (o < worst._1 || (o == worst._1 && w.compareTo(worst._2) < 0)) {
        buf.poll(); buf.offer((o, w)); ()
      }
    }

  override def update(buf: java.util.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): java.util.PriorityQueue[(Long, UTF8String)] = {
    val o = ord.eval(input)
    val w = word.eval(input)
    if (o != null && w != null)
      // clone: the input row's backing buffer is reused across rows
      insert(buf, o.asInstanceOf[Long],
        w.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Long, UTF8String)],
      other: java.util.PriorityQueue[(Long, UTF8String)])
      : java.util.PriorityQueue[(Long, UTF8String)] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); insert(buf, p._1, p._2) }
    buf
  }

  override def eval(
      buf: java.util.PriorityQueue[(Long, UTF8String)]): Any = {
    val arr = buf.toArray(new Array[(Long, UTF8String)](buf.size))
    java.util.Arrays.sort(arr, TopKWords.AscOrder)
    new GenericArrayData(arr.map(p => InternalRow(p._1, p._2): Any))
  }

  override def serialize(
      buf: java.util.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 24 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeLong(p._1)
      val bytes = p._2.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val o = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.offer((o, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("word", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ord, word)
  override def prettyName: String = "topk_words"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKWords =
    copy(ord = newChildren(0), word = newChildren(1))
}

object TopKWords {

  /** Ascending (ord, word) — the output order; binary UTF-8 word order. */
  private[plans] val AscOrder: java.util.Comparator[(Long, UTF8String)] =
    new java.util.Comparator[(Long, UTF8String)] {
      override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  /** Descending — heap order putting the worst kept pair at the root. */
  private[plans] val DescOrder: java.util.Comparator[(Long, UTF8String)] =
    java.util.Collections.reverseOrder(AscOrder)

  /** Column-API entry point: `topkWords(ord, word, k)` aggregates to the
    * k smallest (ord, word) struct pairs in ascending order.
    */
  def topkWords(ord: Column, word: Column, k: Int): Column =
    Bridge.column(
      TopKWords(Bridge.expression(ord), Bridge.expression(word), k)
        .toAggregateExpression())
}
