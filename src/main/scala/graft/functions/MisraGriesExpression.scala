package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable Spark aggregate.
  *
  * The classic streaming heavy-hitter summary (Misra & Gries 1982) with the
  * mergeable-summaries reduction of Agarwal et al. (PODS 2012): at most `k`
  * counters live at any time; inserting an unseen item with all counters
  * full decrements every counter by 1, and merging two summaries adds
  * counts then subtracts the (k+1)-th largest so at most `k` survive.
  *
  * Guarantee (the load-bearing part): for every item x with true frequency
  * f(x) over N processed rows, the sketch's stored count c(x) satisfies
  *
  *   f(x) - N/(k+1)  <=  c(x)  <=  f(x)
  *
  * so any item with f(x) > N/(k+1) is PRESENT in the final summary. That
  * makes the sketch a sound candidate generator for exact heavy hitters:
  * one sketch pass (k counters per partition travel through partial
  * aggregation — the corpus token stream itself never shuffles), then one
  * exact counting pass restricted to the <= k candidates.
  *
  * This is the same role the reference's profiling "top" statistic plays
  * (`/root/reference/plugins/extractors/bigquery/profile.go` computes a
  * most-frequent value per column) — generalized to a bounded-memory
  * distributed sketch with a correctness guarantee.
  *
  * Returns array<struct<term string, lb bigint>> sorted by (lb desc, term
  * asc); `lb` is the surviving counter, a LOWER bound on the true count.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None =>
          // all k counters busy: the classic decrement-all step
          val keys = buf.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val nv = buf(keys(i)) - 1
            if (nv == 0L) buf.remove(keys(i)) else buf(keys(i)) = nv
            i += 1
          }
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everyone; <= k survive
      // (Agarwal et al.: the merged summary keeps the MG error bound)
      val vals = buf.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(buf.size - k - 1)
      val keys = buf.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val nv = buf(keys(i)) - sub
        if (nv <= 0L) buf.remove(keys(i)) else buf(keys(i)) = nv
        i += 1
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"
}

object MisraGriesSketch {
  /** Column API: `df.agg(MisraGriesSketch(col("term"), 256))`. */
  def apply(termCol: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(termCol), k).toAggregateExpression())
}
