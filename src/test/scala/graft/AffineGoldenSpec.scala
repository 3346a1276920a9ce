package graft

import graft.affine.{AffineGrid, LocalAffine}
import graft.ndarray.Nd

/** Golden parity for the local-affine field path, including the (4/3)^d
  * seam quirk and crop semantics (FIXTURES.md §A).
  */
class AffineGoldenSpec extends SparkSpec {

  private def runFixture(name: String): Unit = {
    val sc = Golden.sidecar(name)
    val grid = sc.ints("grid")
    val bs = sc.ints("blocksize")
    val o = sc.ints("overlap")
    val spacing = sc.floats("spacing")
    val disp = sc.bool("displacement")
    val mat = sc.ints("matshape")
    val shape = sc.longs("shape")
    val affines = AffineGrid(grid(0), grid(1), grid(2), mat(0), mat(1),
      Golden.readDoubles(s"$name.affines.raw"))
    val out = LocalAffine.localAffinesToField(
      spark, shape, spacing, affines, bs, o, disp)
    val got = out.collectDense()
    val want = Golden.readFloats(s"$name.out.raw")
    assert(got.length == want.length, s"$name: size ${got.length} != ${want.length}")
    val diff = Nd.maxAbsDiff(got, want)
    assert(diff <= 1e-5f, s"$name: max abs diff $diff > 1e-5")
  }

  test("affine_identity_disp: identity affines -> exactly zero field") {
    runFixture("affine_identity_disp")
  }
  test("affine_identity_pos: positions reproduce seam weight sums") {
    runFixture("affine_identity_pos")
  }
  test("affine_translate: (4/3)^d seam inflation quirk, bug-for-bug") {
    runFixture("affine_translate")
  }
  test("affine_rand_disp: random 3x4 affines, displacement") {
    runFixture("affine_rand_disp")
  }
  test("affine_rand_pos: random 3x4 affines, positions") {
    runFixture("affine_rand_pos")
  }
  test("affine_o1: degenerate overlap=1 (seam sum = 2)") {
    runFixture("affine_o1")
  }
  test("crop_shape: crop to shape < padded domain") {
    runFixture("crop_shape")
  }
}
