object MB {
  // inline copy of the ORIGINAL DecimalDot fold (BigDecimal accumulator)
  def dotOrig(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.types.Decimal = {
    import org.apache.spark.sql.types.Decimal
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      val d = Decimal(p)
      if (!d.changePrecision(30, 12)) return null
      acc = acc.add(d.toJavaBigDecimal)
      i += 1
    }
    Decimal(acc, 30, 12)
  }
  // inline copy of the ORIGINAL SignBucket fold (BigDecimal per plane)
  def signOrig(v: org.apache.spark.sql.catalyst.util.ArrayData,
      signs: Array[Array[Boolean]], dim: Int): org.apache.spark.unsafe.types.UTF8String = {
    import org.apache.spark.sql.types.Decimal
    import org.apache.spark.unsafe.types.UTF8String
    val nBits = signs.length
    val out = new Array[Byte](nBits)
    java.util.Arrays.fill(out, '0'.toByte)
    if (v == null || v.numElements() != dim) return UTF8String.fromBytes(out)
    val dec = new Array[java.math.BigDecimal](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return UTF8String.fromBytes(out)
      val d = Decimal(v.getFloat(j).toDouble)
      if (!d.changePrecision(30, 12)) return UTF8String.fromBytes(out)
      dec(j) = d.toJavaBigDecimal
      j += 1
    }
    var i = 0
    while (i < nBits) {
      var acc = java.math.BigDecimal.ZERO
      val row = signs(i)
      var k = 0
      while (k < dim) {
        acc = if (row(k)) acc.add(dec(k)) else acc.subtract(dec(k))
        k += 1
      }
      if (acc.signum() >= 0) out(i) = '1'.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def main(args: Array[String]): Unit = {
    val dim = 64
    val rnd = new scala.util.Random(42)
    val n = 2000
    val vecs = Array.fill(n)(Array.fill(dim)((rnd.nextDouble()*2-1).toFloat))
    val ads = vecs.map(v => org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
    val signs = graft.functions.SignBucket.signMatrix(0, 32, dim)
    var blake = 0L
    // warm up all four paths
    for (_ <- 1 to 3; a <- ads) {
      blake += graft.functions.SignBucket.compute(a, signs, dim).numBytes()
      blake += signOrig(a, signs, dim).numBytes()
    }
    for (_ <- 1 to 3; i <- 0 until n) {
      val d1 = graft.functions.DecimalDot.compute(ads(i), ads((i+1)%n)); if (d1 != null) blake += d1.toJavaBigDecimal.signum()
      val d2 = dotOrig(ads(i), ads((i+1)%n)); if (d2 != null) blake += d2.toJavaBigDecimal.signum()
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length/2)
    // interleaved rounds: each round times new then old back-to-back so
    // an epoch shift hits both
    val rs = (1 to 9).map { _ =>
      val t0 = System.nanoTime()
      for (a <- ads) blake += graft.functions.SignBucket.compute(a, signs, dim).numBytes()
      val t1 = System.nanoTime()
      for (a <- ads) blake += signOrig(a, signs, dim).numBytes()
      val t2 = System.nanoTime()
      for (i <- 0 until n) { val d = graft.functions.DecimalDot.compute(ads(i), ads((i+1)%n)); if (d != null) blake += d.toJavaBigDecimal.signum() }
      val t3 = System.nanoTime()
      for (i <- 0 until n) { val d = dotOrig(ads(i), ads((i+1)%n)); if (d != null) blake += d.toJavaBigDecimal.signum() }
      val t4 = System.nanoTime()
      ((t1-t0)/1e3/n, (t2-t1)/1e3/n, (t3-t2)/1e3/n, (t4-t3)/1e3/n)
    }
    println(f"signNew=${med(rs.map(_._1))}%.2f signOld=${med(rs.map(_._2))}%.2f dotCur=${med(rs.map(_._3))}%.2f dotOrig=${med(rs.map(_._4))}%.2f us/row sink=$blake")
  }
}
