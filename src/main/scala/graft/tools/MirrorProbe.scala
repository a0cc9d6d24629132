package graft.tools
import graft.functions.MirrorMath
object MirrorProbe {
  def main(args: Array[String]): Unit = {
    val xs = Seq(-700.0, -30.5, -2.345678901, -1e-9, 0.0, 1e-9, 0.3, 1.0, 2.718281828, 45.67, 700.0,
      -0.6931471805599453, 0.34657359027997264)
    xs.foreach { x =>
      println(f"E $x%.17g ${java.lang.Double.doubleToRawLongBits(MirrorMath.expm(x))}%016x")
    }
    val ys = Seq(4.9e-324, 1e-300, 1e-12, 0.001, 0.5, 0.9999999, 1.0, 1.0000001, 1.5, 2.0, 3.14159, 99.5, 1e300)
    ys.foreach { y =>
      println(f"L $y%.17g ${java.lang.Double.doubleToRawLongBits(MirrorMath.logm(y))}%016x")
    }
  }
}
