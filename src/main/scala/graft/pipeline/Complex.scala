package graft.pipeline

/** Complex number, standing in for Go's complex64/complex128 so
  * SumComplexType / AvgComplexType (reference stages/aggregate/
  * aggregate.go:53,98) have a JVM equivalent.
  */
final case class Complex(re: Double, im: Double) {
  def +(o: Complex): Complex = Complex(re + o.re, im + o.im)
  def /(d: Double): Complex = Complex(re / d, im / d)
}

object Complex {
  val zero: Complex = Complex(0.0, 0.0)
}
