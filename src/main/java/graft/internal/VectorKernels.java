package graft.internal;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD distance kernels (Panama Vector API) for graph-internal distance
 * calls — the JVM analog of the reference's AVX implementations
 * ({@code /root/reference/simd/*.c}, {@code index/space/avx_impl.go}).
 * Loaded reflectively by {@code graft.core.DistKernel}; requires
 * {@code --add-modules jdk.incubator.vector} at runtime.
 */
public final class VectorKernels implements graft.core.DistKernel {
    private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

    @Override
    public double euclidean(float[] a, float[] b) {
        int n = Math.min(a.length, b.length);
        int upper = S.loopBound(n);
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector d = FloatVector.fromArray(S, a, i).sub(FloatVector.fromArray(S, b, i));
            acc = d.fma(d, acc);
        }
        float sum = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            float d = a[i] - b[i];
            sum += d * d;
        }
        return Math.sqrt((double) sum);
    }

    @Override
    public double manhattan(float[] a, float[] b) {
        int n = Math.min(a.length, b.length);
        int upper = S.loopBound(n);
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            acc = acc.add(FloatVector.fromArray(S, a, i).sub(FloatVector.fromArray(S, b, i)).abs());
        }
        float sum = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            sum += Math.abs(a[i] - b[i]);
        }
        return (double) sum;
    }

    @Override
    public double cosine(float[] a, float[] b) {
        int n = Math.min(a.length, b.length);
        int upper = S.loopBound(n);
        FloatVector dot = FloatVector.zero(S);
        FloatVector na = FloatVector.zero(S);
        FloatVector nb = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector x = FloatVector.fromArray(S, a, i);
            FloatVector y = FloatVector.fromArray(S, b, i);
            dot = x.fma(y, dot);
            na = x.fma(x, na);
            nb = y.fma(y, nb);
        }
        float dotS = dot.reduceLanes(VectorOperators.ADD);
        float naS = na.reduceLanes(VectorOperators.ADD);
        float nbS = nb.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            dotS += a[i] * b[i];
            naS += a[i] * a[i];
            nbS += b[i] * b[i];
        }
        return Math.abs(1.0 - (double) dotS / (Math.sqrt((double) naS) * Math.sqrt((double) nbS)));
    }
}
