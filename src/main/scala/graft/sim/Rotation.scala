package graft.sim

/** Dense 64×64 linear algebra for the full OPQ rotation (Ge et al. 2013,
  * non-parametric alternation) — self-contained (the sandbox resolves no
  * external numerics library), deterministic, and sized for the one place
  * it runs: O(dim²)–O(dim³) DRIVER-side model math, never per-row work.
  * All algorithms are textbook-public: cyclic Jacobi eigendecomposition
  * (Golub & Van Loan §8.5) and the orthogonal-Procrustes solution
  * R = U Vᵀ from the SVD of the cross-covariance (Schönemann 1966). */
object Rotation {

  type Mat = Array[Array[Double]]

  def matmul(a: Mat, b: Mat): Mat = {
    val n = a.length; val m = b(0).length; val k = b.length
    Array.tabulate(n, m) { (i, j) =>
      var s = 0.0; var t = 0; while (t < k) { s += a(i)(t) * b(t)(j); t += 1 }; s
    }
  }

  def transpose(a: Mat): Mat = Array.tabulate(a(0).length, a.length)((i, j) => a(j)(i))

  def identity(n: Int): Mat = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  def applyTo(r: Mat, x: Array[Double]): Array[Double] = {
    val n = r.length
    Array.tabulate(n) { i =>
      var s = 0.0; var j = 0; while (j < n) { s += r(i)(j) * x(j); j += 1 }; s
    }
  }

  private def offDiagNorm(a: Mat): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Cyclic Jacobi eigendecomposition of a SYMMETRIC matrix:
    * returns (eigenvalues, eigenvectors as COLUMNS of V) with A = V Λ Vᵀ.
    * Deterministic sweep order; converges quadratically. */
  def eighSym(a0: Mat, maxSweeps: Int = 50, tol: Double = 1e-12): (Array[Double], Mat) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = identity(n)
    var sweep = 0
    while (sweep < maxSweeps && offDiagNorm(a) > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            // A ← Jᵀ A J on rows/cols p, q
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Orthogonal Procrustes: the rotation maximizing tr(Rᵀ M) — R = U Vᵀ
    * from M = U Σ Vᵀ. SVD built from the eigendecomposition of Mᵀ M
    * (symmetric PSD): V = its eigenvectors, σ = √λ, uᵢ = M vᵢ / σᵢ;
    * near-null directions (σ ≈ 0, arbitrary in the true SVD) are completed
    * into an orthonormal basis by Gram-Schmidt so R stays orthogonal. */
  def procrustes(m: Mat): Mat = {
    val n = m.length
    val (lam, v) = eighSym(matmul(transpose(m), m))
    // order by descending eigenvalue, deterministic tie-break on index
    val order = (0 until n).sortBy(i => (-lam(i), i))
    val sigma = order.map(i => math.sqrt(math.max(lam(i), 0.0)))
    val vCols: Array[Array[Double]] = order.map(i => Array.tabulate(n)(r => v(r)(i))).toArray
    // relative null-space cutoff at √machine-epsilon scale: a true zero
    // eigenvalue of MᵀM surfaces numerically as ~1e-15·‖M‖², whose square
    // root (~3e-8·‖M‖) would pass any absolute-1e-10 test and divide a
    // noise eigenvector into a garbage U column
    val scale = sigma.headOption.getOrElse(0.0)
    val eps = math.max(scale, 1e-300) * 1e-6
    val uCols = Array.ofDim[Array[Double]](n)
    var k = 0
    while (k < n && sigma(k) > eps) {
      val mv = applyTo(m, vCols(k))
      uCols(k) = mv.map(_ / sigma(k))
      k += 1
    }
    // complete degenerate directions: Gram-Schmidt the standard basis
    var e = 0
    var fill = k
    while (fill < n && e < n) {
      val cand = Array.tabulate(n)(i => if (i == e) 1.0 else 0.0)
      var j = 0
      while (j < fill) {
        val d = dot(cand, uCols(j))
        var i = 0; while (i < n) { cand(i) -= d * uCols(j)(i); i += 1 }
        j += 1
      }
      val nrm = math.sqrt(dot(cand, cand))
      if (nrm > 1e-8) { uCols(fill) = cand.map(_ / nrm); fill += 1 }
      e += 1
    }
    // Modified Gram-Schmidt polish of U: columns built from
    // ill-conditioned directions (σ within a few decades of the cutoff)
    // carry O(ε·σmax/σk) non-orthogonality that would leak into R —
    // re-orthonormalizing in order is exact for already-clean columns and
    // caps the defect at machine epsilon otherwise
    var gi = 0
    while (gi < n) {
      var gj = 0
      while (gj < gi) {
        val d = dot(uCols(gi), uCols(gj))
        var t = 0; while (t < n) { uCols(gi)(t) -= d * uCols(gj)(t); t += 1 }
        gj += 1
      }
      val nrm = math.sqrt(dot(uCols(gi), uCols(gi)))
      if (nrm > 1e-14) { var t = 0; while (t < n) { uCols(gi)(t) /= nrm; t += 1 } }
      gi += 1
    }
    // R = U Vᵀ  (columns u_k outer v_k summed)
    val r = Array.fill(n, n)(0.0)
    var c = 0
    while (c < n) {
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { r(i)(j) += uCols(c)(i) * vCols(c)(j); j += 1 }
        i += 1
      }
      c += 1
    }
    r
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  /** Orthogonality defect ‖RᵀR − I‖_∞ — the invariant specs assert. */
  def orthoDefect(r: Mat): Double = {
    val g = matmul(transpose(r), r)
    var worst = 0.0
    for (i <- g.indices; j <- g.indices) {
      val expect = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(g(i)(j) - expect))
    }
    worst
  }
}
