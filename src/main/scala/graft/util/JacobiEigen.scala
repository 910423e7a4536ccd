package graft.util

/** Dense symmetric eigendecomposition via the classic cyclic Jacobi
  * rotation method (public-domain numerical recipe; e.g. Golub & Van Loan
  * §8.5). Driver-side only: the matrices here are d×d covariance matrices
  * (d = embedding dims, 64 in the fixtures) — microseconds of work, no
  * reason to distribute. Deterministic: fixed sweep order, fixed
  * convergence threshold, no randomness.
  */
object JacobiEigen {

  /** Eigen-decompose a symmetric matrix.
    *
    * @param a symmetric n×n matrix (not mutated)
    * @return (eigenvalues, eigenvectors) sorted by eigenvalue DESCENDING;
    *         eigenvectors(k) is the unit eigenvector for eigenvalues(k),
    *         sign-normalized so its largest-|component| entry is positive
    *         (makes results deterministic for specs and serialization).
    */
  def decompose(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    require(n > 0 && a.forall(_.length == n), "square matrix required")
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiagNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(2.0 * s)
    }

    var sweep = 0
    while (offDiagNorm() > 1e-12 && sweep < 100) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(m(p)(q)) > 1e-300) {
            // 2×2 symmetric Schur rotation annihilating m(p)(q)
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < n) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < n) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val order = (0 until n).sortBy(i => -m(i)(i))
    val vals = order.map(i => m(i)(i)).toArray
    val vecs = order.map { col =>
      val vec = Array.tabulate(n)(r => v(r)(col))
      // deterministic sign: largest-|component| entry positive
      var bi = 0
      var k = 1
      while (k < n) { if (math.abs(vec(k)) > math.abs(vec(bi))) bi = k; k += 1 }
      if (vec(bi) < 0) vec.map(x => -x) else vec
    }.toArray
    (vals, vecs)
  }
}
