package graft.operators

import graft.{SparkSpec, Tables}

class ClassifierSpec extends SparkSpec {

  test("logreg training: learns, deterministically, partitioning-invariant") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val m1 = Classifier.trainLogReg(docs, iters = 2).collect()
    assert(m1.length == 1, "model is one row")
    val row = m1.head
    val ws = (0 until 4).map(row.getDouble)
    assert(ws.exists(_ != 0.0), "two gradient steps must move the weights")
    val (nPos, nDocs) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_docs"))
    assert(nDocs == docs.count())
    // the sf0.001 corpus is all-keep by the label rule, so a learning
    // model must score (at least almost) everything positive
    assert(nPos > nDocs / 2, s"model moved against the labels: $nPos/$nDocs")

    val m2 = Classifier.trainLogReg(docs.repartition(13), iters = 2).collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq,
      "nano-unit integer gradient sums must be partitioning-invariant")
  }

  test("logreg gradient direction: keep-heavy corpus pushes scores up") {
    import spark.implicits._
    // all labels 1 (40 in-range tokens, high uniq): residual sigma(0)-1 < 0
    // everywhere, so one step must increase w0 (bias) above 0
    val allKeep = (0L until 20L).map(i =>
      (i, (0 until 40).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val w = Classifier.trainLogReg(allKeep, iters = 1).collect().head
    assert(w.getDouble(0) > 0.0, "bias must move toward the positive class")
    assert(w.getAs[Long]("n_pos") == 20L, "after one step every doc scores > 1/2")
  }
}
