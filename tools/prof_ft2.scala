// breakdown: collect vs GD loop
val labeled2 = docs.withColumn("label", (TF.filterReason(col("text")) === "ok").cast("int"))
def collectSample() = timeIt("collect") { labeled2.filter(col("label").isNotNull && col("text").isNotNull).orderBy(col("doc_id")).limit(4096).select(col("label").cast("double"), graft.operators.FastTextQuality.docBuckets(col("text"), 1 << 14, 2)).collect() }
val raw = collectSample(); val raw2 = collectSample()
val sample = timeIt("prep") { raw.map { r => val bkts = r.getSeq[Int](1); val x = if (bkts.isEmpty) Array.empty[(Int, Double)] else bkts.groupBy(identity).map { case (b, c) => (b, c.size.toDouble / bkts.size) }.toArray.sortBy(_._1); (r.getDouble(0), x) } }
println(s"[prof] sample n=${sample.length} avg nnz=${sample.map(_._2.length).sum / sample.length}")
def gdLoop(): Array[Double] = { val numBuckets = 1 << 14; val n = sample.length; val w = new Array[Double](numBuckets + 1); var it = 0; while (it < 150) { val grad = new Array[Double](numBuckets + 1); var r = 0; while (r < n) { val (y, x) = sample(r); var z = w(0); var j = 0; while (j < x.length) { z += w(x(j)._1 + 1) * x(j)._2; j += 1 }; val err = 1.0 / (1.0 + math.exp(-z)) - y; grad(0) += err; j = 0; while (j < x.length) { grad(x(j)._1 + 1) += err * x(j)._2; j += 1 }; r += 1 }; var j = 0; while (j <= numBuckets) { w(j) -= 0.5 * grad(j) / n; j += 1 }; it += 1 }; w }
val w1 = timeIt("gd tuple#1") { gdLoop() }
val w2 = timeIt("gd tuple#2") { gdLoop() }
// primitive-array variant, same order
val idx = sample.map(_._2.map(_._1 + 1)); val vs = sample.map(_._2.map(_._2)); val ys = sample.map(_._1)
def gdPrim(): Array[Double] = { val numBuckets = 1 << 14; val n = ys.length; val w = new Array[Double](numBuckets + 1); var it = 0; while (it < 150) { val grad = new Array[Double](numBuckets + 1); var r = 0; while (r < n) { val ix = idx(r); val xv = vs(r); var z = w(0); var j = 0; while (j < ix.length) { z += w(ix(j)) * xv(j); j += 1 }; val err = 1.0 / (1.0 + math.exp(-z)) - ys(r); grad(0) += err; j = 0; while (j < ix.length) { grad(ix(j)) += err * xv(j); j += 1 }; r += 1 }; var j = 0; while (j <= numBuckets) { w(j) -= 0.5 * grad(j) / n; j += 1 }; it += 1 }; w }
val w3 = timeIt("gd prim#1") { gdPrim() }
val w4 = timeIt("gd prim#2") { gdPrim() }
println(s"[prof] identical=${java.util.Arrays.equals(w2, w4)}")
println("PROF2_DONE")
