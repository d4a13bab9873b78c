package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic fixed-size group sampling: keep the k values whose
  * seeded selection key is smallest ("bottom-k sketch").
  *
  * Why a custom `TypedImperativeAggregate` (the aggregate-expression
  * layer of SURVEY §2.9): Spark has no per-group fixed-k sample —
  * `TABLESAMPLE` is per-fraction and not per-group, and a reservoir
  * sample is merge-order-dependent (partial aggregation order would
  * change the result between runs). Bottom-k is the mergeable,
  * deterministic alternative: min-k by key is commutative and
  * associative, so ANY partial/merge order yields the same sample — the
  * property a training-data pipeline needs for reproducible subset
  * selection at 100 TB (and it doubles as a KMV distinct-count sketch).
  *
  * The selection key is the md5 hex of `"<seed>:<value>"` — not a JVM
  * hash — so the sample is reproducible OUTSIDE the JVM too: any engine
  * with md5 derives the identical sample (the DuckDB oracle for
  * `t6_group_sample` does exactly that with `row_number() OVER (ORDER BY
  * md5(seed || ':' || v))`).
  *
  * Buffer: a bounded max-heap of (key, value); serialized compactly for
  * shuffle. Output: the sampled values ordered by key (stable).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)

  // per-thread digest + hex table: keyOf runs once per input row, so the
  // hot path must not pay a provider lookup or per-byte String.format
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  private def keyOf(s: String): String = {
    val bytes = digests.get()
      .digest(s"$seed:$s".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  // max-heap on (key, value): head is the current worst member, evicted first
  private val ord: Ordering[(String, String)] = Ordering.Tuple2[String, String]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)](ord)

  override def update(
      buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val e = (keyOf(s), s)
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(String, String)],
      other: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
    other.foreach { e =>
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(ord).map(p => UTF8String.fromString(p._2)).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, s) =>
      out.writeUTF(h)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val h = in.readUTF()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((h, new String(b, java.nio.charset.StandardCharsets.UTF_8)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(child = newChildren.head)
}

object BottomKSample {
  /** Register `bottom_k_sample(value, k, seed)` for SQL + call_function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_sample",
      exprs => {
        require(exprs.length == 3, "bottom_k_sample(value, k, seed)")
        BottomKSample(exprs(0),
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]).toAggregateExpression()
      },
      "built-in")
}
