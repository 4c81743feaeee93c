package graft.simd;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * 16-accumulator-chain dot / L2-squared kernels for the graph-walk
 * ranking path (HNSW / Vamana build and search). The 4-chain scalar
 * kernel is bound by the f64 add dependency chain at ~1 element/cycle;
 * sixteen chains (two 512-bit vectors) lift that bound 4x.
 *
 * ORDER CONTRACT (the deterministic-graph requirement): lane j of
 * accumulator 0 sums elements i+j (j in 0..7), lane j of accumulator 1
 * sums elements i+8+j, i stepping by 16; the tail (n % 16) accumulates
 * into one scalar; the final value is the fixed balanced tree
 *   t0=(s0+s1)+(s2+s3); t1=(s4+s5)+(s6+s7);
 *   t2=(s8+s9)+(s10+s11); t3=(s12+s13)+(s14+s15);
 *   ((t0+t1)+(t2+t3)) + tail.
 * VectorKernels' scalar 16-chain fallback implements the identical
 * order, and its init self-check requires bit-equality, so graphs do
 * not depend on whether this class loads. SPECIES_512 is fixed (not
 * PREFERRED) so the lane-to-index mapping -- and therefore the value --
 * is the same on every host; on narrower hardware the JVM emulates it.
 *
 * f32 values widen exactly to f64; mul and add stay separate IEEE ops
 * (the Vector API never fuses them).
 */
public final class SimdRank {

  private static final VectorSpecies<Double> SP = DoubleVector.SPECIES_512;
  private static final VectorSpecies<Float> SPF = FloatVector.SPECIES_256;

  private SimdRank() {}

  /** Dot product of a[ao..ao+n) and b[bo..bo+n) in the 16-chain order. */
  public static double dot(float[] a, int ao, float[] b, int bo, int n) {
    int main = n & ~15;
    DoubleVector acc0 = DoubleVector.zero(SP);
    DoubleVector acc1 = DoubleVector.zero(SP);
    int i = 0;
    while (i < main) {
      DoubleVector va0 = FloatVector.fromArray(SPF, a, ao + i)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles();
      DoubleVector vb0 = FloatVector.fromArray(SPF, b, bo + i)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles();
      DoubleVector va1 = FloatVector.fromArray(SPF, a, ao + i + 8)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles();
      DoubleVector vb1 = FloatVector.fromArray(SPF, b, bo + i + 8)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles();
      acc0 = acc0.add(va0.mul(vb0));
      acc1 = acc1.add(va1.mul(vb1));
      i += 16;
    }
    double tail = 0.0;
    while (i < n) {
      tail += (double) a[ao + i] * (double) b[bo + i];
      i++;
    }
    return reduce(acc0, acc1, tail, main);
  }

  /** Squared L2 distance in the same 16-chain order. */
  public static double l2sq(float[] a, int ao, float[] b, int bo, int n) {
    int main = n & ~15;
    DoubleVector acc0 = DoubleVector.zero(SP);
    DoubleVector acc1 = DoubleVector.zero(SP);
    int i = 0;
    while (i < main) {
      DoubleVector d0 = FloatVector.fromArray(SPF, a, ao + i)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles()
          .sub(FloatVector.fromArray(SPF, b, bo + i)
              .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles());
      DoubleVector d1 = FloatVector.fromArray(SPF, a, ao + i + 8)
          .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles()
          .sub(FloatVector.fromArray(SPF, b, bo + i + 8)
              .convertShape(VectorOperators.F2D, SP, 0).reinterpretAsDoubles());
      acc0 = acc0.add(d0.mul(d0));
      acc1 = acc1.add(d1.mul(d1));
      i += 16;
    }
    double tail = 0.0;
    while (i < n) {
      double d = (double) a[ao + i] - (double) b[bo + i];
      tail += d * d;
      i++;
    }
    return reduce(acc0, acc1, tail, main);
  }

  private static double reduce(DoubleVector acc0, DoubleVector acc1,
      double tail, int main) {
    if (main == 0) return tail; // no vector lanes touched: pure tail
    double s0 = acc0.lane(0), s1 = acc0.lane(1), s2 = acc0.lane(2),
        s3 = acc0.lane(3), s4 = acc0.lane(4), s5 = acc0.lane(5),
        s6 = acc0.lane(6), s7 = acc0.lane(7);
    double s8 = acc1.lane(0), s9 = acc1.lane(1), s10 = acc1.lane(2),
        s11 = acc1.lane(3), s12 = acc1.lane(4), s13 = acc1.lane(5),
        s14 = acc1.lane(6), s15 = acc1.lane(7);
    double t0 = (s0 + s1) + (s2 + s3);
    double t1 = (s4 + s5) + (s6 + s7);
    double t2 = (s8 + s9) + (s10 + s11);
    double t3 = (s12 + s13) + (s14 + s15);
    return ((t0 + t1) + (t2 + t3)) + tail;
  }
}
