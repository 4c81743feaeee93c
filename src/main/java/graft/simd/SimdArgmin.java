package graft.simd;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorSpecies;

/**
 * Candidate-parallel L2-squared sums over a TRANSPOSED, f64-widened
 * centroid table -- the argmin scan of IVF cell assignment and PQ
 * subspace encoding with one CANDIDATE PER SIMD LANE.
 *
 * Bit-identity contract: lane c accumulates candidate c's terms in
 * element order 0..dims-1 with one f64 accumulator -- exactly the scalar
 * sequential kernel's order for that candidate (f32-to-f64 widening is
 * exact and done once at transpose time; mul and add stay separate IEEE
 * ops, never fused). The per-candidate sums this produces are therefore
 * bit-equal to {@code VectorKernels.l2sq(v, cent_c)} for every
 * candidate, and any argmin over them picks the identical index.
 *
 * Lives in its own class so a JVM without {@code jdk.incubator.vector}
 * fails at class load inside the caller's try/catch probe and falls
 * back to the scalar path.
 */
public final class SimdArgmin {

  private static final VectorSpecies<Double> SP = DoubleVector.SPECIES_PREFERRED;

  private SimdArgmin() {}

  /** Lanes per vector; the transposed table must pad its candidate
   * count to a multiple of {@code 2 * laneCount()}. */
  public static int laneCount() {
    return SP.length();
  }

  /**
   * Fill {@code sums[0..kPad)} with the L2-squared distance of
   * {@code v[off..off+dims)} to each of the kPad transposed candidates.
   * Layout: {@code tcent[i * kPad + c]} is candidate c's element i.
   * {@code kPad} must be a multiple of {@code 2 * laneCount()}; padded
   * candidate columns produce well-defined garbage sums the caller must
   * ignore (scan only real candidates).
   */
  public static void l2sqTransposed(double[] tcent, int kPad, float[] v,
      int off, int dims, double[] sums) {
    int L = SP.length();
    int step = L * 2; // two accumulator chains hide the add latency
    for (int cb = 0; cb < kPad; cb += step) {
      DoubleVector acc0 = DoubleVector.zero(SP);
      DoubleVector acc1 = DoubleVector.zero(SP);
      int base = cb;
      for (int i = 0; i < dims; i++) {
        DoubleVector q = DoubleVector.broadcast(SP, (double) v[off + i]);
        DoubleVector d0 = q.sub(DoubleVector.fromArray(SP, tcent, base));
        DoubleVector d1 = q.sub(DoubleVector.fromArray(SP, tcent, base + L));
        acc0 = acc0.add(d0.mul(d0));
        acc1 = acc1.add(d1.mul(d1));
        base += kPad;
      }
      acc0.intoArray(sums, cb);
      acc1.intoArray(sums, cb + L);
    }
  }
}
