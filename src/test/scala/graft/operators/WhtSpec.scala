package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Walsh–Hadamard transform laws over the exact-integer kernel: the
  * Hadamard matrix's orthogonality makes Parseval an INTEGER identity
  * (Σ_k W_k² = 64·Σ_p x_p², no epsilon), the transform is linear, and
  * band 0 is the frame sum (DC). These certify q192's band energies are a
  * true sequency decomposition, not just some hash of the samples. */
object WhtSpec extends Properties("WalshHadamard") {

  private val frameGen: Gen[Array[Short]] =
    Gen.containerOfN[Array, Short](64,
      Gen.chooseNum[Short](-32000, 32000))

  property("Parseval: sum over all 64 bands of W_k^2 == 64 * sum x^2") =
    forAll(frameGen) { xs =>
      val lhs = (0 until 64).map { k =>
        val w = Multimodal.whtCoeff(xs, 0, k)
        // BigInt: 64 coefficients each up to 64*32000 — squares sum past 2^63
        BigInt(w) * BigInt(w)
      }.sum
      val rhs = BigInt(64) * xs.map(x => BigInt(x.toLong) * x.toLong).sum
      lhs == rhs
    }

  property("linearity: W_k(a + b) == W_k(a) + W_k(b)") =
    forAll(frameGen, frameGen, Gen.choose(0, 63)) { (a, b, k) =>
      // element-wise sum stays in Int range; kernel reads via toLong
      val ab = Array.tabulate(64)(i => (a(i) / 2 + b(i) / 2).toShort)
      val a2 = a.map(x => (x / 2).toShort)
      val b2 = b.map(x => (x / 2).toShort)
      Multimodal.whtCoeff(ab, 0, k) ==
        Multimodal.whtCoeff(a2, 0, k) + Multimodal.whtCoeff(b2, 0, k)
    }

  property("band 0 is the DC sum") =
    forAll(frameGen) { xs =>
      Multimodal.whtCoeff(xs, 0, 0) == xs.map(_.toLong).sum
    }
}
