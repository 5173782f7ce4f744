package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-key head buffer for [[TopKHeads]]: the k smallest
  * (seq, url, urlHash) triples by seq, insertion-sorted (k is small —
  * burst + slack). */
final class HeadsBuffer(val k: Int) {
  var size = 0
  val seqs = new Array[Long](k)
  val hashes = new Array[Long](k)
  val urls = new Array[AnyRef](k) // UTF8String

  def insert(seq: Long, url: AnyRef, hash: Long): Unit = {
    if (size == k && seq >= seqs(size - 1)) return
    var i = if (size < k) size else k - 1
    // shift larger entries right
    while (i > 0 && seqs(i - 1) > seq) {
      seqs(i) = seqs(i - 1); hashes(i) = hashes(i - 1); urls(i) = urls(i - 1)
      i -= 1
    }
    seqs(i) = seq; hashes(i) = hash; urls(i) = url
    if (size < k) size += 1
  }

  def mergeFrom(o: HeadsBuffer): HeadsBuffer = {
    var i = 0
    while (i < o.size) { insert(o.seqs(i), o.urls(i), o.hashes(i)); i += 1 }
    this
  }
}

/** Exact top-k-by-seq per group as ONE hash aggregation with map-side
  * partial combine: the politeness workbench's per-host head queue
  * (reference `VisitState.java:284-304` FIFO heads) computed in a single
  * pass over the frontier — no per-host window sort, no full-frontier
  * ordering, shuffle volume = k rows per host per map partition.
  *
  * Output: array<struct<seq:long, url:string, urlHash:long>> ascending by
  * seq. Deterministic at any parallelism (the k smallest of a set is
  * merge-order-independent; seqs are unique). */
case class TopKHeads(
    seq: Expression,
    url: Expression,
    urlHash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeadsBuffer] {

  require(k >= 1 && k <= 4096, s"topk_heads k out of range: $k")

  override def children: Seq[Expression] = Seq(seq, url, urlHash)
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(new StructType()
    .add("seq", LongType).add("url", StringType).add("urlHash", LongType),
    containsNull = false)

  override def createAggregationBuffer(): HeadsBuffer = new HeadsBuffer(k)

  override def update(b: HeadsBuffer, input: InternalRow): HeadsBuffer = {
    val s = seq.eval(input)
    if (s != null) {
      val u = url.eval(input)
      val h = urlHash.eval(input)
      // the k-th check before the copy: only rows actually entering the
      // buffer pay the allocation
      if (b.size < b.k || s.asInstanceOf[Long] < b.seqs(b.size - 1)) {
        // MUST copy: the evaluated UTF8String points into a reused unsafe
        // row buffer; storing the reference aliases later input rows
        val uCopy = if (u == null) UTF8String.EMPTY_UTF8 else u.asInstanceOf[UTF8String].clone()
        b.insert(s.asInstanceOf[Long], uCopy,
          if (h == null) 0L else h.asInstanceOf[Long])
      }
    }
    b
  }

  override def merge(b: HeadsBuffer, o: HeadsBuffer): HeadsBuffer = b.mergeFrom(o)

  override def eval(b: HeadsBuffer): Any = {
    val rows = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      rows(i) = InternalRow(b.seqs(i), b.urls(i), b.hashes(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: HeadsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeLong(b.seqs(i))
      out.writeLong(b.hashes(i))
      val ub = b.urls(i).asInstanceOf[UTF8String].getBytes
      out.writeInt(ub.length)
      out.write(ub)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeadsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new HeadsBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      b.seqs(i) = in.readLong()
      b.hashes(i) = in.readLong()
      val len = in.readInt()
      val ub = new Array[Byte](len)
      in.readFully(ub)
      b.urls(i) = UTF8String.fromBytes(ub)
      i += 1
    }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKHeads = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKHeads = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKHeads =
    copy(seq = c(0), url = c(1), urlHash = c(2))
  override def prettyName: String = "topk_heads"
}
