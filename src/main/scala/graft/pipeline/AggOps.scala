package graft.pipeline

import scala.reflect.ClassTag

/** Shared aggregation bodies used by both [[Aggregate]] (sync) and
  * [[AsyncAggregate]] (future-returning) — one implementation of the
  * reference's 17 aggregations (stages/aggregate/aggregate.go and
  * stages/asyncaggregate/asyncaggregate.go share semantics the same
  * way).
  *
  * All of these are distributed Spark actions: partial aggregation
  * happens map-side per partition (`fold`/`reduce`/`aggregateByKey`
  * semantics), and only the per-partition results travel to the
  * driver. The materializing ones (`asSlice`, `groupBy`, `asMap`,
  * `asMultiMap`, `distinct`, `sort`) collect the final result because
  * that is their contract (the reference returns in-memory values);
  * at 100 TB you would keep results distributed via the column API
  * ([[graft.queries]]) instead.
  */
private[pipeline] object AggOps {

  def sum[T](stage: Stage[T])(implicit num: Numeric[T]): T =
    stage.ds.rdd.fold(num.zero)(num.plus)

  def sumComplex(stage: Stage[Complex]): Complex =
    stage.ds.rdd.fold(Complex.zero)(_ + _)

  def avg[T](stage: Stage[T])(implicit num: Numeric[T]): Double = {
    val (cnt, total) = stage.ds.rdd
      .map(t => (1L, num.toDouble(t)))
      .fold((0L, 0.0)) { case ((c1, s1), (c2, s2)) => (c1 + c2, s1 + s2) }
    total / cnt // empty → NaN, matching Go's 0/0 float division
  }

  def avgComplex(stage: Stage[Complex]): Complex = {
    val (cnt, total) = stage.ds.rdd
      .map(c => (1L, c))
      .fold((0L, Complex.zero)) { case ((c1, s1), (c2, s2)) => (c1 + c2, s1 + s2) }
    total / cnt.toDouble
  }

  def max[T](stage: Stage[T])(implicit num: Numeric[T]): T =
    stage.ds.reduce((a, b) => num.max(a, b))

  def min[T](stage: Stage[T])(implicit num: Numeric[T]): T =
    stage.ds.reduce((a, b) => num.min(a, b))

  def count[T](stage: Stage[T]): Long = stage.ds.count()

  def sort[T: Ordering: ClassTag](stage: Stage[T]): Seq[T] =
    stage.ds.rdd.sortBy(identity).collect().toSeq

  def sortDesc[T: Ordering: ClassTag](stage: Stage[T]): Seq[T] =
    stage.ds.rdd.sortBy(identity, ascending = false).collect().toSeq

  // aggregateByKey, not groupBy/groupByKey: map-side combine builds the
  // per-key vectors before the shuffle, halving shuffle volume vs
  // shipping every raw value (the result is driver-materialized by the
  // pippin contract either way, but the shuffle shouldn't pay twice)
  def groupBy[T, K: ClassTag](stage: Stage[T], f: T => K): Map[K, Seq[T]] = {
    implicit val tt: ClassTag[T] = stage.ds.encoder.clsTag
    stage.ds.rdd.map(t => (f(t), t))
      .aggregateByKey(Vector.empty[T])(_ :+ _, _ ++ _)
      .collect().toMap
  }

  def reduce[T](stage: Stage[T], f: (T, T) => T): T = stage.ds.reduce(f)

  def asSlice[T](stage: Stage[T]): Seq[T] = stage.ds.collect().toSeq

  def asMap[T, K: ClassTag, V: ClassTag](stage: Stage[T], f: T => (K, V)): Map[K, V] =
    stage.ds.rdd.map(f).collectAsMap().toMap

  def asMultiMap[T, K: ClassTag, V: ClassTag](stage: Stage[T], f: T => (K, V)): Map[K, Seq[V]] =
    stage.ds.rdd.map(f)
      .aggregateByKey(Vector.empty[V])(_ :+ _, _ ++ _)
      .collect().toMap

  def forEach[T](stage: Stage[T], f: T => Unit): Unit = stage.ds.foreach(f)

  def distinct[T](stage: Stage[T]): Seq[T] = stage.ds.distinct().collect().toSeq

  def distinctCount[T](stage: Stage[T]): Long = stage.ds.distinct().count()
}
