// Native witness generator for the modular-reduction gadget.
//
// The reference does this work in Rust with num-bigint per row
// (src/modular/modular.rs:38-100); our Python fallback uses exact ints.
// This module is the hot host-side path: batched computation of the
// modular-op witness (output, quotient, aux polynomial split) for arrays of
// signed 31-coefficient limb polynomials, plus batched Fq inversion so
// EC-lambda witnesses can stay in limb arrays end to end.
//
// Arithmetic: 16-bit limb interface, 32-bit digit long division (Knuth
// algorithm D) against the fixed BN254 modulus, __int128 intermediates.
// Build: see build.sh (g++ -O3 -shared -fPIC). Interface: plain C ABI for
// ctypes.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <cstdlib>
// Worker-thread count: hardware concurrency, capped by STARKY_NATIVE_THREADS
// when set. The pipelined prover's forked tracegen worker caps itself to a
// share of the cores so the parent's device-dispatch loop (and the tunnel
// client's compression threads) stay responsive — an uncapped 4-thread
// tracegen measured a 6x inflation of the concurrent prove's wall clock.
static unsigned native_threads() {
    unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    const char* cap = std::getenv("STARKY_NATIVE_THREADS");
    if (cap != nullptr) {
        long v = std::atol(cap);
        if (v >= 1 && (unsigned)v < hw) return (unsigned)v;
    }
    return hw;
}

#include <vector>

namespace {

constexpr int N16 = 16;        // 16-bit limbs per 256-bit value
constexpr int WIDE = 31;       // 2*N16 - 1
constexpr int N32 = 8;         // 32-bit digits per 256-bit value
constexpr int64_t AUX_MAX = (int64_t)1 << 29;

// BN254 base modulus, little-endian 32-bit digits
const uint32_t P32[N32] = {
    0xd87cfd47u, 0x3c208c16u, 0x6871ca8du, 0x97816a91u,
    0x8181585du, 0xb85045b6u, 0xe131a029u, 0x30644e72u,
};

struct U288 {  // up to 512-bit magnitudes: use 17 x 32-bit digits (544 bits)
    uint32_t d[18];
};

// ---------------------------------------------------------------------------
// helpers on raw digit arrays (little endian, base 2^32)
// ---------------------------------------------------------------------------

int digits_norm(const uint32_t* a, int n) {
    while (n > 0 && a[n - 1] == 0) n--;
    return n;
}

int digits_cmp(const uint32_t* a, int na, const uint32_t* b, int nb) {
    na = digits_norm(a, na);
    nb = digits_norm(b, nb);
    if (na != nb) return na < nb ? -1 : 1;
    for (int i = na - 1; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

// a -= b (a >= b), lengths na >= nb
void digits_sub(uint32_t* a, int na, const uint32_t* b, int nb) {
    int64_t borrow = 0;
    for (int i = 0; i < na; i++) {
        int64_t bi = i < nb ? (int64_t)b[i] : 0;
        int64_t t = (int64_t)a[i] - bi - borrow;
        if (t < 0) {
            t += ((int64_t)1 << 32);
            borrow = 1;
        } else {
            borrow = 0;
        }
        a[i] = (uint32_t)t;
    }
}

// Knuth algorithm D: q, r = u / v with v = P32 (8 digits). u has nu digits
// (<= 16). q gets up to nu-7 digits, r gets 8 digits.
void divmod_p(const uint32_t* u_in, int nu, uint32_t* q_out, int* nq_out,
              uint32_t* r_out) {
    nu = digits_norm(u_in, nu);
    const int nv = N32;
    std::memset(q_out, 0, sizeof(uint32_t) * 10);
    std::memset(r_out, 0, sizeof(uint32_t) * N32);
    if (digits_cmp(u_in, nu, P32, nv) < 0) {
        for (int i = 0; i < nu; i++) r_out[i] = u_in[i];
        *nq_out = 0;
        return;
    }
    // normalize: shift so that top digit of v has high bit set
    uint32_t vtop = P32[nv - 1];
    int s = 0;
    while (!(vtop & 0x80000000u)) {
        vtop <<= 1;
        s++;
    }
    uint32_t vn[N32];
    for (int i = nv - 1; i > 0; i--)
        vn[i] = (s == 0) ? P32[i]
                         : (P32[i] << s) | (P32[i - 1] >> (32 - s));
    vn[0] = P32[0] << s;

    uint32_t un[19];
    std::memset(un, 0, sizeof(un));
    if (s == 0) {
        for (int i = 0; i < nu; i++) un[i] = u_in[i];
        un[nu] = 0;
    } else {
        un[0] = u_in[0] << s;
        for (int i = 1; i < nu; i++)
            un[i] = (u_in[i] << s) | (u_in[i - 1] >> (32 - s));
        un[nu] = u_in[nu - 1] >> (32 - s);
    }

    int m = nu - nv;  // q has m+1 digits
    for (int j = m; j >= 0; j--) {
        unsigned __int128 num =
            ((unsigned __int128)un[j + nv] << 32) | un[j + nv - 1];
        uint64_t qhat = (uint64_t)(num / vn[nv - 1]);
        uint64_t rhat = (uint64_t)(num % vn[nv - 1]);
        while (qhat >= ((uint64_t)1 << 32) ||
               (unsigned __int128)qhat * vn[nv - 2] >
                   (((unsigned __int128)rhat << 32) | un[j + nv - 2])) {
            qhat--;
            rhat += vn[nv - 1];
            if (rhat >= ((uint64_t)1 << 32)) break;
        }
        // multiply-subtract
        __int128 borrow = 0;
        uint64_t carry = 0;
        for (int i = 0; i < nv; i++) {
            unsigned __int128 p = (unsigned __int128)qhat * vn[i] + carry;
            carry = (uint64_t)(p >> 32);
            int64_t t = (int64_t)un[i + j] - (int64_t)(uint32_t)p - (int64_t)borrow;
            if (t < 0) {
                t += ((int64_t)1 << 32);
                borrow = 1;
            } else {
                borrow = 0;
            }
            un[i + j] = (uint32_t)t;
        }
        int64_t t = (int64_t)un[j + nv] - (int64_t)carry - (int64_t)borrow;
        if (t < 0) {
            // add back
            t += ((int64_t)1 << 32);
            un[j + nv] = (uint32_t)t;
            qhat--;
            uint64_t c2 = 0;
            for (int i = 0; i < nv; i++) {
                uint64_t sum = (uint64_t)un[i + j] + vn[i] + c2;
                un[i + j] = (uint32_t)sum;
                c2 = sum >> 32;
            }
            un[j + nv] += (uint32_t)c2;
        } else {
            un[j + nv] = (uint32_t)t;
        }
        q_out[j] = (uint32_t)qhat;
    }
    // denormalize remainder
    for (int i = 0; i < nv; i++) {
        uint32_t hi = (i + 1 < nv) ? un[i + 1] : 0;
        r_out[i] = (s == 0) ? un[i] : (un[i] >> s) | (hi << (32 - s));
    }
    *nq_out = digits_norm(q_out, m + 1);
}

// value of a signed 31-coeff polynomial at 2^16 -> (sign, magnitude digits)
// coefficients |c| < 2^63
void poly_value(const int64_t* c, int n, int* sign_out, uint32_t* mag,
                int* nmag) {
    // accumulate into signed 16-bit-limb representation with carries
    // limb count: 31 coeffs + overflow headroom
    int64_t limbs[40];
    std::memset(limbs, 0, sizeof(limbs));
    for (int i = 0; i < n; i++) limbs[i] = c[i];
    // carry-normalize into balanced limbs, then fix sign at the end
    int64_t carry = 0;
    for (int i = 0; i < 40; i++) {
        int64_t t = limbs[i] + carry;
        int64_t lo = t & 0xFFFF;
        carry = (t - lo) >> 16;
        limbs[i] = lo;
    }
    // carry must be 0 or -1 here; if -1, the value is negative:
    // value = sum(limbs) - 2^(16*40)... handle by two's complement fix
    int sign = 1;
    if (carry < 0) {
        sign = -1;
        // negate: value = -(2^(16*40) - sum limbs)
        int64_t borrow = 0;
        for (int i = 0; i < 40; i++) {
            int64_t t = 0 - limbs[i] - borrow;
            if (t < 0) {
                t += 1 << 16;
                borrow = 1;
            } else {
                borrow = 0;
            }
            limbs[i] = t;
        }
        // borrow out of the top cancels against carry==-1
    } else if (carry > 0) {
        // positive overflow cannot happen for our inputs (< 2^512)
        sign = 1;
    }
    std::memset(mag, 0, sizeof(uint32_t) * 20);
    for (int i = 0; i < 20; i++) {
        uint64_t v = (uint64_t)(limbs[2 * i] & 0xFFFF) |
                     ((uint64_t)(limbs[2 * i + 1] & 0xFFFF) << 16);
        mag[i] = (uint32_t)v;
    }
    *nmag = digits_norm(mag, 20);
    // zero check
    if (*nmag == 0) sign = 1;
    *sign_out = sign;
}

void digits_to_u16(const uint32_t* d, int nd, uint16_t* out, int n16) {
    std::memset(out, 0, sizeof(uint16_t) * n16);
    for (int i = 0; i < nd && 2 * i < n16; i++) {
        out[2 * i] = (uint16_t)(d[i] & 0xFFFF);
        if (2 * i + 1 < n16) out[2 * i + 1] = (uint16_t)(d[i] >> 16);
    }
}

const uint16_t* p16_limbs() {
    static uint16_t p16[N16];
    static bool init = false;
    if (!init) {
        digits_to_u16(P32, N32, p16, N16);
        init = true;
    }
    return p16;
}

// ---------------------------------------------------------------------------
// single-row building blocks (shared by the batched entry points and the
// fused G1 chain below)
// ---------------------------------------------------------------------------

struct ModOut {
    uint16_t out[N16];
    uint16_t oar[N16];
    uint16_t qabs[N16 + 1];
    uint16_t lo[WIDE];
    uint16_t hi[WIDE];
    uint8_t sign;  // 1 => +1, 0 => p-1
};

// One modular-op witness row: c = 31 signed coefficients. Returns 0 on
// success, nonzero on inconsistency. Mirrors the per-row body of
// batch_modular_witness exactly (same floor semantics / aux offsets).
int modular_witness_row(const int64_t* c, int zero_op, ModOut* o) {
    const uint16_t* p16 = p16_limbs();
    int sign, nmag;
    uint32_t mag[20];
    poly_value(c, WIDE, &sign, mag, &nmag);
    if (nmag > 17) return 1;

    uint32_t q[10], rem[N32];
    int nq;
    divmod_p(mag, nmag, q, &nq, rem);

    int qsign = 1;
    uint32_t qq[10];
    std::memcpy(qq, q, sizeof(qq));
    int rem_zero = digits_norm(rem, N32) == 0;
    if (sign < 0) {
        if (rem_zero) {
            qsign = (nq == 0) ? 1 : -1;
        } else {
            uint32_t tmp[N32];
            std::memcpy(tmp, P32, sizeof(tmp));
            digits_sub(tmp, N32, rem, N32);
            std::memcpy(rem, tmp, sizeof(tmp));
            uint64_t carry = 1;
            for (int i = 0; i < 10 && carry; i++) {
                uint64_t s2 = (uint64_t)qq[i] + carry;
                qq[i] = (uint32_t)s2;
                carry = s2 >> 32;
            }
            qsign = -1;
        }
    }
    if (zero_op && digits_norm(rem, N32) != 0) return 1;

    uint16_t q_l[N16 + 4];
    digits_to_u16(rem, N32, o->out, N16);
    digits_to_u16(qq, 10, q_l, N16 + 4);
    if (q_l[N16 + 1] != 0 || q_l[N16 + 2] != 0 || q_l[N16 + 3] != 0) return 1;

    if (!zero_op) {
        // out_aux_red = (2^256 - p) + output; top digit must vanish
        uint32_t two256mp[9];
        std::memset(two256mp, 0, sizeof(two256mp));
        two256mp[8] = 1;
        {
            int64_t borrow = 0;
            for (int i = 0; i < 9; i++) {
                int64_t pi = i < N32 ? (int64_t)P32[i] : 0;
                int64_t t = (int64_t)two256mp[i] - pi - borrow;
                if (t < 0) {
                    t += (int64_t)1 << 32;
                    borrow = 1;
                } else {
                    borrow = 0;
                }
                two256mp[i] = (uint32_t)t;
            }
        }
        uint32_t oar[9];
        uint64_t carry = 0;
        for (int i = 0; i < 9; i++) {
            uint64_t s2 = (uint64_t)two256mp[i] + (i < N32 ? rem[i] : 0) + carry;
            oar[i] = (uint32_t)s2;
            carry = s2 >> 32;
        }
        if (oar[8] != 0) return 1;
        digits_to_u16(oar, 8, o->oar, N16);
    } else {
        std::memset(o->oar, 0, sizeof(o->oar));
    }
    for (int i = 0; i < N16 + 1; i++) o->qabs[i] = q_l[i];
    o->sign = qsign > 0 ? 1 : 0;

    int64_t constr[2 * N16];
    std::memset(constr, 0, sizeof(constr));
    for (int i = 0; i < WIDE; i++) constr[i] = c[i];
    if (!zero_op)
        for (int i = 0; i < N16; i++) constr[i] -= (int64_t)o->out[i];
    for (int i = 0; i < N16 + 1; i++) {
        int64_t qi = (int64_t)q_l[i] * qsign;
        for (int j = 0; j < N16; j++) constr[i + j] -= qi * (int64_t)p16[j];
    }
    int64_t aux[2 * N16];
    std::memset(aux, 0, sizeof(aux));
    int d = 2 * N16 - 1;
    aux[d - 1] = constr[d];
    for (int i = d - 1; i > 0; i--)
        aux[i - 1] = constr[i] + ((int64_t)1 << 16) * aux[i];
    if (constr[0] + ((int64_t)1 << 16) * aux[0] != 0) return 1;
    if (aux[WIDE] != 0) return 1;
    for (int i = 0; i < WIDE; i++) {
        int64_t v = aux[i] + AUX_MAX;
        if (v < 0 || v > 2 * AUX_MAX) return 1;
        o->lo[i] = (uint16_t)(v & 0xFFFF);
        o->hi[i] = (uint16_t)(v >> 16);
    }
    return 0;
}

// (value of 31 signed coeffs) mod p -> 16 u16 limbs; no witness. Used for
// intermediate reductions whose aux is discarded (2y, dx, dy, products).
void poly_mod_p(const int64_t* c, int nc, uint16_t* out) {
    int sign, nmag;
    uint32_t mag[20];
    int64_t cw[WIDE];
    std::memset(cw, 0, sizeof(cw));
    for (int i = 0; i < nc; i++) cw[i] = c[i];
    poly_value(cw, WIDE, &sign, mag, &nmag);
    uint32_t q[10], rem[N32];
    int nq;
    divmod_p(mag, nmag, q, &nq, rem);
    if (sign < 0 && digits_norm(rem, N32) != 0) {
        uint32_t tmp[N32];
        std::memcpy(tmp, P32, sizeof(tmp));
        digits_sub(tmp, N32, rem, N32);
        std::memcpy(rem, tmp, sizeof(tmp));
    }
    digits_to_u16(rem, N32, out, N16);
}

// schoolbook 16x16 limb product: c[31] (int64) = a * b, limbs as int64
void conv16_row(const int64_t* a, const int64_t* b, int64_t* c) {
    std::memset(c, 0, sizeof(int64_t) * WIDE);
    for (int i = 0; i < N16; i++) {
        if (!a[i]) continue;
        for (int j = 0; j < N16; j++) c[i + j] += a[i] * b[j];
    }
}

}  // namespace

extern "C" int64_t batch_fq_inv(int64_t n, const uint16_t* in_limbs,
                                uint16_t* out_limbs);

namespace {

constexpr uint64_t GL_P = 0xFFFFFFFF00000001ull;

// pack one (lam, w_zero, w_x, w_y) triple into the 320-cell G1Output block
// (order of gadgets/g1.py _pack / g1_batch.py _lambda_pack)
void pack_g1_cells(const uint16_t* lam, const ModOut& wz, const ModOut& wx,
                   const ModOut& wy, uint64_t* cell) {
    int k = 0;
    for (int i = 0; i < N16; i++) cell[k++] = lam[i];
    for (int i = 0; i < N16; i++) cell[k++] = wx.out[i];
    for (int i = 0; i < N16; i++) cell[k++] = wy.out[i];
    for (int i = 0; i < N16 + 1; i++) cell[k++] = wz.qabs[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wz.lo[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wz.hi[i];
    for (int i = 0; i < N16; i++) cell[k++] = wx.oar[i];
    for (int i = 0; i < N16 + 1; i++) cell[k++] = wx.qabs[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wx.lo[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wx.hi[i];
    for (int i = 0; i < N16; i++) cell[k++] = wy.oar[i];
    for (int i = 0; i < N16 + 1; i++) cell[k++] = wy.qabs[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wy.lo[i];
    for (int i = 0; i < WIDE; i++) cell[k++] = wy.hi[i];
    cell[k++] = wz.sign ? 1 : GL_P - 1;
    cell[k++] = wx.sign ? 1 : GL_P - 1;
    cell[k++] = wy.sign ? 1 : GL_P - 1;
}

// ---------------------------------------------------------------------------
// Fq2 limb helpers (u^2 = -1): components as signed 16-limb int64 arrays
// ---------------------------------------------------------------------------

// (a0 + a1 u)(b0 + b1 u) = (a0b0 - a1b1) + (a0b1 + a1b0) u, wide polys
void fq2_conv_rows(const int64_t a[2][N16], const int64_t b[2][N16],
                   int64_t out[2][WIDE]) {
    int64_t t00[WIDE], t11[WIDE], t01[WIDE], t10[WIDE];
    conv16_row(a[0], b[0], t00);
    conv16_row(a[1], b[1], t11);
    conv16_row(a[0], b[1], t01);
    conv16_row(a[1], b[0], t10);
    for (int i = 0; i < WIDE; i++) {
        out[0][i] = t00[i] - t11[i];
        out[1][i] = t01[i] + t10[i];
    }
}

void u16_to_i64(const uint16_t* in, int64_t* out) {
    for (int i = 0; i < N16; i++) out[i] = in[i];
}

}  // namespace

extern "C" {

// Batched modular-op witness.
//   pol_inputs: [n][31] signed coefficients
//   zero_op: 0 => full op (output + out_aux_red written), 1 => modular-zero
// Outputs (all little-endian u16 limb cells as uint64 field values):
//   outputs:     [n][16]
//   out_aux_red: [n][16]
//   quot_abs:    [n][17]
//   aux_lo:      [n][31]
//   aux_hi:      [n][31]
//   signs:       [n]      (1 or 0; 0 encodes NEG_ONE, caller maps to p-1)
// Returns 0 on success, row index+1 of the first inconsistency otherwise.
int64_t batch_modular_witness(int64_t n, const int64_t* pol_inputs,
                              int32_t zero_op, uint16_t* outputs,
                              uint16_t* out_aux_red, uint16_t* quot_abs,
                              uint16_t* aux_lo, uint16_t* aux_hi,
                              uint8_t* signs) {
    const uint16_t* p16 = p16_limbs();
    for (int64_t r = 0; r < n; r++) {
        const int64_t* c = pol_inputs + r * WIDE;
        int sign, nmag;
        uint32_t mag[20];
        poly_value(c, WIDE, &sign, mag, &nmag);
        if (nmag > 17) return r + 1;  // |value| must fit ~544 bits

        uint32_t q[10], rem[N32];
        int nq;
        divmod_p(mag, nmag, q, &nq, rem);

        // floor semantics for signed values
        // value = sign * (q*p + rem)
        int64_t out16[N16];
        int qsign = 1;
        uint32_t qq[10];
        std::memcpy(qq, q, sizeof(qq));
        int rem_zero = digits_norm(rem, N32) == 0;
        if (sign >= 0) {
            // output = rem, quot = q
        } else {
            if (rem_zero) {
                qsign = (nq == 0) ? 1 : -1;
            } else {
                // output = p - rem; quot = -(q+1)
                uint32_t tmp[N32];
                std::memcpy(tmp, P32, sizeof(tmp));
                digits_sub(tmp, N32, rem, N32);
                std::memcpy(rem, tmp, sizeof(tmp));
                // qq += 1
                uint64_t carry = 1;
                for (int i = 0; i < 10 && carry; i++) {
                    uint64_t s2 = (uint64_t)qq[i] + carry;
                    qq[i] = (uint32_t)s2;
                    carry = s2 >> 32;
                }
                qsign = -1;
            }
        }
        if (zero_op) {
            if (!rem_zero && sign >= 0) return r + 1;
            if (sign < 0 && digits_norm(rem, N32) != 0) {
                // for zero_op the value must be divisible
                return r + 1;
            }
        }

        uint16_t out_l[N16], q_l[N16 + 4];
        digits_to_u16(rem, N32, out_l, N16);
        digits_to_u16(qq, 10, q_l, N16 + 4);
        // quotient must fit the 17-limb witness column
        if (q_l[N16 + 1] != 0 || q_l[N16 + 2] != 0 || q_l[N16 + 3] != 0)
            return r + 1;

        if (!zero_op) {
            for (int i = 0; i < N16; i++) outputs[r * N16 + i] = out_l[i];
            // out_aux_red = 2^256 - p + output  (fits 256 bits iff output < p)
            uint32_t oar[9];
            std::memset(oar, 0, sizeof(oar));
            // compute output - p + 2^256: output < p so do (2^256 - p) + output
            // 2^256 - p:
            uint32_t two256mp[9];
            std::memset(two256mp, 0, sizeof(two256mp));
            two256mp[8] = 1;  // 2^256 as digit 8
            // subtract p
            {
                int64_t borrow = 0;
                for (int i = 0; i < 9; i++) {
                    int64_t pi = i < N32 ? (int64_t)P32[i] : 0;
                    int64_t t = (int64_t)two256mp[i] - pi - borrow;
                    if (t < 0) {
                        t += (int64_t)1 << 32;
                        borrow = 1;
                    } else {
                        borrow = 0;
                    }
                    two256mp[i] = (uint32_t)t;
                }
            }
            uint64_t carry = 0;
            for (int i = 0; i < 9; i++) {
                uint64_t s2 =
                    (uint64_t)two256mp[i] + (i < N32 ? rem[i] : 0) + carry;
                oar[i] = (uint32_t)s2;
                carry = s2 >> 32;
            }
            if (oar[8] != 0) return r + 1;  // output >= p (impossible)
            uint16_t oar16[N16];
            digits_to_u16(oar, 8, oar16, N16);
            for (int i = 0; i < N16; i++)
                out_aux_red[r * N16 + i] = oar16[i];
        }
        for (int i = 0; i < N16 + 1; i++) quot_abs[r * (N16 + 1) + i] = q_l[i];
        signs[r] = qsign > 0 ? 1 : 0;

        // constr(x) = pol_input - output - qsigned(x) * p(x), 32 coeffs
        int64_t constr[2 * N16];
        std::memset(constr, 0, sizeof(constr));
        for (int i = 0; i < WIDE; i++) constr[i] = c[i];
        if (!zero_op) {
            for (int i = 0; i < N16; i++)
                constr[i] -= (int64_t)outputs[r * N16 + i];
        }
        for (int i = 0; i < N16 + 1; i++) {
            int64_t qi = (int64_t)q_l[i] * qsign;
            for (int j = 0; j < N16; j++) constr[i + j] -= qi * (int64_t)p16[j];
        }
        // exact division by (x - 2^16), top-down (division-free)
        int64_t aux[2 * N16];
        std::memset(aux, 0, sizeof(aux));
        int d = 2 * N16 - 1;  // degree bound; constr[31] should vanish
        aux[d - 1] = constr[d];
        for (int i = d - 1; i > 0; i--)
            aux[i - 1] = constr[i] + ((int64_t)1 << 16) * aux[i];
        if (constr[0] + ((int64_t)1 << 16) * aux[0] != 0) return r + 1;
        if (aux[WIDE] != 0) return r + 1;
        for (int i = 0; i < WIDE; i++) {
            int64_t v = aux[i] + AUX_MAX;
            if (v < 0 || v > 2 * AUX_MAX) return r + 1;
            aux_lo[r * WIDE + i] = (uint16_t)(v & 0xFFFF);
            aux_hi[r * WIDE + i] = (uint16_t)(v >> 16);
        }
    }
    return 0;
}

// Batched Fq inversion (extended Euclid), limbs in/out.
// Returns 0 on success, row+1 if a value is zero / not invertible.
int64_t batch_fq_inv(int64_t n, const uint16_t* in_limbs, uint16_t* out_limbs) {
    for (int64_t r = 0; r < n; r++) {
        // convert to 4x64
        unsigned __int128 dummy = 0;
        (void)dummy;
        uint64_t a[4] = {0, 0, 0, 0}, p[4];
        for (int i = 0; i < N16; i++) {
            a[i / 4] |= (uint64_t)in_limbs[r * N16 + i] << (16 * (i % 4));
        }
        const uint16_t* p16 = p16_limbs();
        for (int i = 0; i < 4; i++) p[i] = 0;
        for (int i = 0; i < N16; i++)
            p[i / 4] |= (uint64_t)p16[i] << (16 * (i % 4));

        // binary extended gcd over 256-bit values
        auto is_zero = [](const uint64_t* x) {
            return !(x[0] | x[1] | x[2] | x[3]);
        };
        auto is_even = [](const uint64_t* x) { return (x[0] & 1) == 0; };
        auto shr1 = [](uint64_t* x) {
            for (int i = 0; i < 3; i++) x[i] = (x[i] >> 1) | (x[i + 1] << 63);
            x[3] >>= 1;
        };
        auto geq = [](const uint64_t* x, const uint64_t* y) {
            for (int i = 3; i >= 0; i--) {
                if (x[i] != y[i]) return x[i] > y[i];
            }
            return true;
        };
        auto sub = [](uint64_t* x, const uint64_t* y) {
            unsigned __int128 borrow = 0;
            for (int i = 0; i < 4; i++) {
                unsigned __int128 t =
                    (unsigned __int128)x[i] - y[i] - (uint64_t)borrow;
                x[i] = (uint64_t)t;
                borrow = (t >> 64) ? 1 : 0;
            }
        };
        auto add_nored = [](uint64_t* x, const uint64_t* y) {
            // plain 256-bit add (no reduction); callers guarantee no overflow
            unsigned __int128 carry = 0;
            for (int i = 0; i < 4; i++) {
                unsigned __int128 t =
                    (unsigned __int128)x[i] + y[i] + (uint64_t)carry;
                x[i] = (uint64_t)t;
                carry = t >> 64;
            }
        };

        if (is_zero(a)) return r + 1;
        uint64_t u[4], v[4], b[4] = {1, 0, 0, 0}, c[4] = {0, 0, 0, 0};
        std::memcpy(u, a, sizeof(u));
        std::memcpy(v, p, sizeof(v));
        // invariant: b*a === u, c*a === v (mod p)
        while (!is_zero(u)) {
            while (is_even(u)) {
                shr1(u);
                if (is_even(b)) {
                    shr1(b);
                } else {
                    // b = (b + p) / 2 -- p odd so b+p even
                    unsigned __int128 carry = 0;
                    uint64_t t[4];
                    for (int i = 0; i < 4; i++) {
                        unsigned __int128 s2 =
                            (unsigned __int128)b[i] + p[i] + (uint64_t)carry;
                        t[i] = (uint64_t)s2;
                        carry = s2 >> 64;
                    }
                    for (int i = 0; i < 3; i++)
                        t[i] = (t[i] >> 1) | (t[i + 1] << 63);
                    t[3] = (t[3] >> 1) | ((uint64_t)carry << 63);
                    std::memcpy(b, t, sizeof(t));
                }
            }
            while (is_even(v)) {
                shr1(v);
                if (is_even(c)) {
                    shr1(c);
                } else {
                    unsigned __int128 carry = 0;
                    uint64_t t[4];
                    for (int i = 0; i < 4; i++) {
                        unsigned __int128 s2 =
                            (unsigned __int128)c[i] + p[i] + (uint64_t)carry;
                        t[i] = (uint64_t)s2;
                        carry = s2 >> 64;
                    }
                    for (int i = 0; i < 3; i++)
                        t[i] = (t[i] >> 1) | (t[i + 1] << 63);
                    t[3] = (t[3] >> 1) | ((uint64_t)carry << 63);
                    std::memcpy(c, t, sizeof(t));
                }
            }
            if (geq(u, v)) {
                sub(u, v);
                // b = b - c (mod p): lift b by p first if needed
                if (!geq(b, c)) add_nored(b, p);
                sub(b, c);
            } else {
                sub(v, u);
                if (!geq(c, b)) add_nored(c, p);
                sub(c, b);
            }
        }
        // v should be 1; c is the inverse
        if (v[0] != 1 || v[1] || v[2] || v[3]) return r + 1;
        for (int i = 0; i < N16; i++)
            out_limbs[r * N16 + i] =
                (uint16_t)((c[i / 4] >> (16 * (i % 4))) & 0xFFFF);
    }
    return 0;
}

// Fused G1 double-and-add witness chain (the whole 512-row x n-instance
// row loop of G1ExpAir.generate_trace_and_pi in ONE call: the per-row
// Python/ctypes/astype overhead was ~45% of warm trace generation).
//
//   ax0..by0:  [n][16] u16 initial coordinates (a = base point, b = acc)
//   is_double: [rows] u8 — 1: every instance doubles a; 0: bit-row
//   bits:      [n][rows] u8 — filtered bit per instance (read on bit rows)
//   main_out:  [n][rows][row_stride] u64 — the trace's main block; this
//              writes cells [coord_off .. coord_off+64) = (ax ay bx by) at
//              row start and [cells_off .. cells_off+320) = G1Output
//   final_bx/by: [n][16] u16 — b after the chain (the proven output)
//
// Returns 0 on success; (inst*rows + row + 1) of the first failure.
int64_t g1_exp_chain(int64_t n, int64_t rows, const uint16_t* ax0,
                     const uint16_t* ay0, const uint16_t* bx0,
                     const uint16_t* by0, const uint8_t* is_double,
                     const uint8_t* bits, uint64_t* main_out,
                     int64_t row_stride, int64_t coord_off, int64_t cells_off,
                     uint16_t* final_bx, uint16_t* final_by) {
    // instance chains are independent: split them across hardware threads
    std::atomic<int64_t> err(0);
    auto run_range = [&](int64_t inst_lo, int64_t inst_hi) {
    for (int64_t inst = inst_lo;
         inst < inst_hi && !err.load(std::memory_order_relaxed); inst++) {
        int64_t ax[N16], ay[N16], bx[N16], by[N16];
        for (int i = 0; i < N16; i++) {
            ax[i] = ax0[inst * N16 + i];
            ay[i] = ay0[inst * N16 + i];
            bx[i] = bx0[inst * N16 + i];
            by[i] = by0[inst * N16 + i];
        }
        for (int64_t r = 0; r < rows; r++) {
            uint64_t* row_base =
                main_out + (inst * rows + r) * row_stride;
            uint64_t* coords = row_base + coord_off;
            for (int i = 0; i < N16; i++) {
                coords[i] = (uint64_t)ax[i];
                coords[N16 + i] = (uint64_t)ay[i];
                coords[2 * N16 + i] = (uint64_t)bx[i];
                coords[3 * N16 + i] = (uint64_t)by[i];
            }
            uint64_t* cell = row_base + cells_off;
            int is_add = !is_double[r] && bits[inst * rows + r];
            if (!is_double[r] && !is_add) {
                // filtered-off row: zero cells, quot_signs default to 1
                std::memset(cell, 0, sizeof(uint64_t) * 320);
                cell[317] = cell[318] = cell[319] = 1;
                continue;
            }
            int64_t conv[WIDE], conv2[WIDE], pol[WIDE];
            uint16_t lam[N16], inv16[N16], red[N16];
            ModOut wz, wx, wy;
            if (is_double[r]) {
                // lam = 3*ax^2 * inv(2*ay)
                int64_t two_y[N16];
                for (int i = 0; i < N16; i++) two_y[i] = 2 * ay[i];
                poly_mod_p(two_y, N16, red);
                if (batch_fq_inv(1, red, inv16)) { err.store(inst * rows + r + 1); return; }
                conv16_row(ax, ax, conv);  // ax^2
                int64_t sq3[WIDE];
                for (int i = 0; i < WIDE; i++) sq3[i] = 3 * conv[i];
                uint16_t x_sq3[N16];
                poly_mod_p(sq3, WIDE, x_sq3);
                int64_t x3l[N16], invl[N16];
                for (int i = 0; i < N16; i++) {
                    x3l[i] = x_sq3[i];
                    invl[i] = inv16[i];
                }
                conv16_row(x3l, invl, conv2);
                poly_mod_p(conv2, WIDE, lam);
                int64_t laml[N16];
                for (int i = 0; i < N16; i++) laml[i] = lam[i];
                // zero: 2*conv(lam, ay) - 3*conv(ax, ax)
                conv16_row(laml, ay, conv2);
                for (int i = 0; i < WIDE; i++)
                    pol[i] = 2 * conv2[i] - 3 * conv[i];
                if (modular_witness_row(pol, 1, &wz)) { err.store(inst * rows + r + 1); return; }
                // new_x: conv(lam, lam) - 2*ax
                conv16_row(laml, laml, pol);
                for (int i = 0; i < N16; i++) pol[i] -= 2 * ax[i];
                if (modular_witness_row(pol, 0, &wx)) { err.store(inst * rows + r + 1); return; }
                // new_y: conv(lam, ax - new_x) - ay
                int64_t diff[N16];
                for (int i = 0; i < N16; i++)
                    diff[i] = ax[i] - (int64_t)wx.out[i];
                conv16_row(laml, diff, pol);
                for (int i = 0; i < N16; i++) pol[i] -= ay[i];
                if (modular_witness_row(pol, 0, &wy)) { err.store(inst * rows + r + 1); return; }
                pack_g1_cells(lam, wz, wx, wy, cell);
                for (int i = 0; i < N16; i++) {
                    ax[i] = wx.out[i];
                    ay[i] = wy.out[i];
                }
            } else {
                // lam = (by - ay) * inv(bx - ax)
                int64_t dx[N16], dy[N16];
                for (int i = 0; i < N16; i++) {
                    dx[i] = bx[i] - ax[i];
                    dy[i] = by[i] - ay[i];
                }
                poly_mod_p(dx, N16, red);
                int nz = 0;
                for (int i = 0; i < N16; i++) nz |= red[i];
                if (!nz) { err.store(inst * rows + r + 1); return; }  // equal x: degenerate
                if (batch_fq_inv(1, red, inv16)) { err.store(inst * rows + r + 1); return; }
                uint16_t dy_red[N16];
                poly_mod_p(dy, N16, dy_red);
                int64_t dyl[N16], invl[N16];
                for (int i = 0; i < N16; i++) {
                    dyl[i] = dy_red[i];
                    invl[i] = inv16[i];
                }
                conv16_row(dyl, invl, conv2);
                poly_mod_p(conv2, WIDE, lam);
                int64_t laml[N16];
                for (int i = 0; i < N16; i++) laml[i] = lam[i];
                // zero: conv(lam, dx) - dy
                conv16_row(laml, dx, pol);
                for (int i = 0; i < N16; i++) pol[i] -= dy[i];
                if (modular_witness_row(pol, 1, &wz)) { err.store(inst * rows + r + 1); return; }
                // new_x: conv(lam, lam) - (ax + bx)
                conv16_row(laml, laml, pol);
                for (int i = 0; i < N16; i++) pol[i] -= ax[i] + bx[i];
                if (modular_witness_row(pol, 0, &wx)) { err.store(inst * rows + r + 1); return; }
                // new_y: conv(lam, ax - new_x) - ay
                int64_t diff[N16];
                for (int i = 0; i < N16; i++)
                    diff[i] = ax[i] - (int64_t)wx.out[i];
                conv16_row(laml, diff, pol);
                for (int i = 0; i < N16; i++) pol[i] -= ay[i];
                if (modular_witness_row(pol, 0, &wy)) { err.store(inst * rows + r + 1); return; }
                pack_g1_cells(lam, wz, wx, wy, cell);
                for (int i = 0; i < N16; i++) {
                    bx[i] = wx.out[i];
                    by[i] = wy.out[i];
                }
            }
        }
        for (int i = 0; i < N16; i++) {
            final_bx[inst * N16 + i] = (uint16_t)bx[i];
            final_by[inst * N16 + i] = (uint16_t)by[i];
        }
    }
    };  // run_range
    int64_t nt = std::min<int64_t>(
        n, native_threads());
    if (nt <= 1) {
        run_range(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n + nt - 1) / nt;
        for (int64_t t = 0; t < nt; t++) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run_range, lo, hi);
        }
        for (auto& th : ts) th.join();
    }
    return err.load();
}

// pack one G2Output block [640 cells]: lam0 lam1 | newx0 newx1 newy0 newy1
// | 2x (zero: qabs lo hi) | 4x (x/y: oar qabs lo hi) | 6 signs
// (order of gadgets/g2.py zero_g2_output / g2_batch.py _pack_g2)
static void pack_g2_cells(const int64_t lam[2][N16], const ModOut wz[2],
                          const ModOut wx[2], const ModOut wy[2],
                          uint64_t* cell) {
    int k = 0;
    for (int c = 0; c < 2; c++)
        for (int i = 0; i < N16; i++) cell[k++] = (uint64_t)lam[c][i];
    for (int c = 0; c < 2; c++)
        for (int i = 0; i < N16; i++) cell[k++] = wx[c].out[i];
    for (int c = 0; c < 2; c++)
        for (int i = 0; i < N16; i++) cell[k++] = wy[c].out[i];
    for (int c = 0; c < 2; c++) {
        for (int i = 0; i < N16 + 1; i++) cell[k++] = wz[c].qabs[i];
        for (int i = 0; i < WIDE; i++) cell[k++] = wz[c].lo[i];
        for (int i = 0; i < WIDE; i++) cell[k++] = wz[c].hi[i];
    }
    const ModOut* xy[4] = {&wx[0], &wx[1], &wy[0], &wy[1]};
    for (int t = 0; t < 4; t++) {
        for (int i = 0; i < N16; i++) cell[k++] = xy[t]->oar[i];
        for (int i = 0; i < N16 + 1; i++) cell[k++] = xy[t]->qabs[i];
        for (int i = 0; i < WIDE; i++) cell[k++] = xy[t]->lo[i];
        for (int i = 0; i < WIDE; i++) cell[k++] = xy[t]->hi[i];
    }
    cell[k++] = wz[0].sign ? 1 : GL_P - 1;
    cell[k++] = wz[1].sign ? 1 : GL_P - 1;
    cell[k++] = wx[0].sign ? 1 : GL_P - 1;
    cell[k++] = wx[1].sign ? 1 : GL_P - 1;
    cell[k++] = wy[0].sign ? 1 : GL_P - 1;
    cell[k++] = wy[1].sign ? 1 : GL_P - 1;
}

// fq2 inverse of a canonical pair; returns nonzero on failure
static int fq2_inv_rows(const int64_t a[2][N16], int64_t out[2][N16]) {
    int64_t n0[WIDE], n1[WIDE], norm[WIDE];
    conv16_row(a[0], a[0], n0);
    conv16_row(a[1], a[1], n1);
    for (int i = 0; i < WIDE; i++) norm[i] = n0[i] + n1[i];
    uint16_t norm_red[N16], inv16[N16];
    poly_mod_p(norm, WIDE, norm_red);
    if (batch_fq_inv(1, norm_red, inv16)) return 1;
    int64_t invl[N16];
    u16_to_i64(inv16, invl);
    int64_t c0[WIDE], c1[WIDE];
    conv16_row(a[0], invl, c0);
    conv16_row(a[1], invl, c1);
    for (int i = 0; i < WIDE; i++) c1[i] = -c1[i];
    uint16_t r0[N16], r1[N16];
    poly_mod_p(c0, WIDE, r0);
    poly_mod_p(c1, WIDE, r1);
    u16_to_i64(r0, out[0]);
    u16_to_i64(r1, out[1]);
    return 0;
}

// shared tail of the G2 double/add witness: zero/new_x/new_y witnesses from
// lam, the op's x (a for both ops), y, and the two prepared polynomials
static int g2_finish(const int64_t lam[2][N16], const int64_t x[2][N16],
                     const int64_t y[2][N16], const int64_t zero_pol[2][WIDE],
                     const int64_t nx_pol[2][WIDE], ModOut wz[2], ModOut wx[2],
                     ModOut wy[2]) {
    for (int c = 0; c < 2; c++)
        if (modular_witness_row(zero_pol[c], 1, &wz[c])) return 1;
    for (int c = 0; c < 2; c++)
        if (modular_witness_row(nx_pol[c], 0, &wx[c])) return 1;
    int64_t diff[2][N16];
    for (int c = 0; c < 2; c++)
        for (int i = 0; i < N16; i++)
            diff[c][i] = x[c][i] - (int64_t)wx[c].out[i];
    int64_t lam_d[2][WIDE];
    fq2_conv_rows(lam, diff, lam_d);
    for (int c = 0; c < 2; c++) {
        int64_t pol[WIDE];
        for (int i = 0; i < WIDE; i++)
            pol[i] = lam_d[c][i] - (i < N16 ? y[c][i] : 0);
        if (modular_witness_row(pol, 0, &wy[c])) return 1;
    }
    return 0;
}

// Fused Fq exponentiation witness chain: per row ONE modular multiply
// (square on a-rows, conditional multiply into b on bit rows). Coord block
// = 2*16 cells (a, b); cell block = FqOutput 112 cells
// [out(16) oar(16) qabs(17) lo(31) hi(31) sign(1)].
int64_t fq_exp_chain(int64_t n, int64_t rows, const uint16_t* a0,
                     const uint16_t* b0, const uint8_t* is_square,
                     const uint8_t* bits, uint64_t* main_out,
                     int64_t row_stride, int64_t coord_off, int64_t cells_off,
                     uint16_t* final_b) {
    std::atomic<int64_t> err(0);
    auto run_range = [&](int64_t inst_lo, int64_t inst_hi) {
        for (int64_t inst = inst_lo;
             inst < inst_hi && !err.load(std::memory_order_relaxed); inst++) {
            int64_t a[N16], b[N16];
            for (int i = 0; i < N16; i++) {
                a[i] = a0[inst * N16 + i];
                b[i] = b0[inst * N16 + i];
            }
            for (int64_t r = 0; r < rows; r++) {
                uint64_t* row_base =
                    main_out + (inst * rows + r) * row_stride;
                uint64_t* coords = row_base + coord_off;
                for (int i = 0; i < N16; i++) {
                    coords[i] = (uint64_t)a[i];
                    coords[N16 + i] = (uint64_t)b[i];
                }
                uint64_t* cell = row_base + cells_off;
                int is_mul = !is_square[r] && bits[inst * rows + r];
                if (!is_square[r] && !is_mul) {
                    std::memset(cell, 0, sizeof(uint64_t) * 112);
                    cell[111] = 1;  // quot_sign default
                    continue;
                }
                int64_t pol[WIDE];
                conv16_row(a, is_square[r] ? a : b, pol);
                ModOut w;
                if (modular_witness_row(pol, 0, &w)) {
                    err.store(inst * rows + r + 1);
                    return;
                }
                int k = 0;
                for (int i = 0; i < N16; i++) cell[k++] = w.out[i];
                for (int i = 0; i < N16; i++) cell[k++] = w.oar[i];
                for (int i = 0; i < N16 + 1; i++) cell[k++] = w.qabs[i];
                for (int i = 0; i < WIDE; i++) cell[k++] = w.lo[i];
                for (int i = 0; i < WIDE; i++) cell[k++] = w.hi[i];
                cell[k++] = w.sign ? 1 : GL_P - 1;
                int64_t* dst = is_square[r] ? a : b;
                for (int i = 0; i < N16; i++) dst[i] = w.out[i];
            }
            for (int i = 0; i < N16; i++)
                final_b[inst * N16 + i] = (uint16_t)b[i];
        }
    };
    int64_t nt = std::min<int64_t>(
        n, native_threads());
    if (nt <= 1) {
        run_range(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n + nt - 1) / nt;
        for (int64_t t = 0; t < nt; t++) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run_range, lo, hi);
        }
        for (auto& th : ts) th.join();
    }
    return err.load();
}

// Fused Fq12 exponentiation witness chain. Values are [12][16] limb
// vectors (MyFq12 coefficient order); one multiplication = the 6x6 Fq2
// schoolbook with the xi = 9+u fold-down (reference fields/fq12/mul.rs:
// 24-87) into 12 wide polys + 12 modular witnesses. Coord block = 24*16
// cells (a, b); cell block = Fq12Output 1344 cells
// [12x out | 12x (oar qabs lo hi) | 12 signs].
int64_t fq12_exp_chain(int64_t n, int64_t rows, const uint16_t* a0,
                       const uint16_t* b0, const uint8_t* is_square,
                       const uint8_t* bits, uint64_t* main_out,
                       int64_t row_stride, int64_t coord_off,
                       int64_t cells_off, uint16_t* final_b) {
    const int V = 12 * N16;  // cells per Fq12 value
    std::atomic<int64_t> err(0);
    auto run_range = [&](int64_t inst_lo, int64_t inst_hi) {
        // one multiplication's working set (heap: ~36 KB of wide polys)
        std::vector<int64_t> ab(12 * 12 * WIDE);
        std::vector<int64_t> re(11 * WIDE), im(11 * WIDE);
        std::vector<int64_t> wides(12 * WIDE);
        ModOut w[12];
        for (int64_t inst = inst_lo;
             inst < inst_hi && !err.load(std::memory_order_relaxed); inst++) {
            int64_t a[12][N16], b[12][N16];
            for (int c = 0; c < 12; c++)
                for (int i = 0; i < N16; i++) {
                    a[c][i] = a0[inst * V + c * N16 + i];
                    b[c][i] = b0[inst * V + c * N16 + i];
                }
            for (int64_t r = 0; r < rows; r++) {
                uint64_t* row_base =
                    main_out + (inst * rows + r) * row_stride;
                uint64_t* coords = row_base + coord_off;
                for (int c = 0; c < 12; c++)
                    for (int i = 0; i < N16; i++) {
                        coords[c * N16 + i] = (uint64_t)a[c][i];
                        coords[V + c * N16 + i] = (uint64_t)b[c][i];
                    }
                uint64_t* cell = row_base + cells_off;
                int is_mul = !is_square[r] && bits[inst * rows + r];
                if (!is_square[r] && !is_mul) {
                    std::memset(cell, 0, sizeof(uint64_t) * 1344);
                    for (int s = 1332; s < 1344; s++) cell[s] = 1;
                    continue;
                }
                const auto rhs = is_square[r] ? a : b;
                // 144 convolutions a_i * rhs_j
                for (int i = 0; i < 12; i++)
                    for (int j = 0; j < 12; j++)
                        conv16_row(a[i], rhs[j],
                                   ab.data() + (i * 12 + j) * WIDE);
                std::memset(re.data(), 0, re.size() * sizeof(int64_t));
                std::memset(im.data(), 0, im.size() * sizeof(int64_t));
                for (int i = 0; i < 6; i++)
                    for (int j = 0; j < 6; j++) {
                        int k = i + j;
                        const int64_t* rr = ab.data() + (i * 12 + j) * WIDE;
                        const int64_t* ii2 =
                            ab.data() + ((i + 6) * 12 + (j + 6)) * WIDE;
                        const int64_t* ri =
                            ab.data() + (i * 12 + (j + 6)) * WIDE;
                        const int64_t* ir =
                            ab.data() + ((i + 6) * 12 + j) * WIDE;
                        int64_t* rk = re.data() + k * WIDE;
                        int64_t* ik = im.data() + k * WIDE;
                        for (int t = 0; t < WIDE; t++) {
                            rk[t] += rr[t] - ii2[t];
                            ik[t] += ri[t] + ir[t];
                        }
                    }
                // xi = 9 + u fold-down into 12 wide polys
                const int64_t XI = 9;
                for (int i = 0; i < 6; i++) {
                    int64_t* o = wides.data() + i * WIDE;
                    const int64_t* r0 = re.data() + i * WIDE;
                    if (i < 5) {
                        const int64_t* r6 = re.data() + (i + 6) * WIDE;
                        const int64_t* i6 = im.data() + (i + 6) * WIDE;
                        for (int t = 0; t < WIDE; t++)
                            o[t] = r0[t] + XI * r6[t] - i6[t];
                    } else {
                        for (int t = 0; t < WIDE; t++) o[t] = r0[t];
                    }
                }
                for (int i = 0; i < 6; i++) {
                    int64_t* o = wides.data() + (6 + i) * WIDE;
                    const int64_t* i0 = im.data() + i * WIDE;
                    if (i < 5) {
                        const int64_t* r6 = re.data() + (i + 6) * WIDE;
                        const int64_t* i6 = im.data() + (i + 6) * WIDE;
                        for (int t = 0; t < WIDE; t++)
                            o[t] = i0[t] + r6[t] + XI * i6[t];
                    } else {
                        for (int t = 0; t < WIDE; t++) o[t] = i0[t];
                    }
                }
                int bad = 0;
                for (int c = 0; c < 12 && !bad; c++)
                    bad = modular_witness_row(wides.data() + c * WIDE, 0,
                                              &w[c]);
                if (bad) {
                    err.store(inst * rows + r + 1);
                    return;
                }
                int k = 0;
                for (int c = 0; c < 12; c++)
                    for (int i = 0; i < N16; i++) cell[k++] = w[c].out[i];
                for (int c = 0; c < 12; c++) {
                    for (int i = 0; i < N16; i++) cell[k++] = w[c].oar[i];
                    for (int i = 0; i < N16 + 1; i++) cell[k++] = w[c].qabs[i];
                    for (int i = 0; i < WIDE; i++) cell[k++] = w[c].lo[i];
                    for (int i = 0; i < WIDE; i++) cell[k++] = w[c].hi[i];
                }
                for (int c = 0; c < 12; c++)
                    cell[k++] = w[c].sign ? 1 : GL_P - 1;
                auto& dst = is_square[r] ? a : b;
                for (int c = 0; c < 12; c++)
                    for (int i = 0; i < N16; i++) dst[c][i] = w[c].out[i];
            }
            for (int c = 0; c < 12; c++)
                for (int i = 0; i < N16; i++)
                    final_b[inst * V + c * N16 + i] = (uint16_t)b[c][i];
        }
    };
    int64_t nt = std::min<int64_t>(
        n, native_threads());
    if (nt <= 1) {
        run_range(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n + nt - 1) / nt;
        for (int64_t t = 0; t < nt; t++) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run_range, lo, hi);
        }
        for (auto& th : ts) th.join();
    }
    return err.load();
}

// Fused G2 double-and-add witness chain; same contract as g1_exp_chain but
// coordinates are Fq2 pairs: ax0..by0 are [n][2][16] u16, the row's coord
// block is 8*16 cells (ax0 ax1 ay0 ay1 bx0 bx1 by0 by1) and the cell block
// is 640 cells (G2Output).
int64_t g2_exp_chain(int64_t n, int64_t rows, const uint16_t* ax0,
                     const uint16_t* ay0, const uint16_t* bx0,
                     const uint16_t* by0, const uint8_t* is_double,
                     const uint8_t* bits, uint64_t* main_out,
                     int64_t row_stride, int64_t coord_off, int64_t cells_off,
                     uint16_t* final_bx, uint16_t* final_by) {
    const int C2 = 2 * N16;
    std::atomic<int64_t> err(0);
    auto run_range = [&](int64_t inst_lo, int64_t inst_hi) {
    for (int64_t inst = inst_lo;
         inst < inst_hi && !err.load(std::memory_order_relaxed); inst++) {
        int64_t ax[2][N16], ay[2][N16], bx[2][N16], by[2][N16];
        for (int c = 0; c < 2; c++)
            for (int i = 0; i < N16; i++) {
                ax[c][i] = ax0[inst * C2 + c * N16 + i];
                ay[c][i] = ay0[inst * C2 + c * N16 + i];
                bx[c][i] = bx0[inst * C2 + c * N16 + i];
                by[c][i] = by0[inst * C2 + c * N16 + i];
            }
        for (int64_t r = 0; r < rows; r++) {
            uint64_t* row_base = main_out + (inst * rows + r) * row_stride;
            uint64_t* coords = row_base + coord_off;
            for (int c = 0; c < 2; c++)
                for (int i = 0; i < N16; i++) {
                    coords[c * N16 + i] = (uint64_t)ax[c][i];
                    coords[C2 + c * N16 + i] = (uint64_t)ay[c][i];
                    coords[2 * C2 + c * N16 + i] = (uint64_t)bx[c][i];
                    coords[3 * C2 + c * N16 + i] = (uint64_t)by[c][i];
                }
            uint64_t* cell = row_base + cells_off;
            int is_add = !is_double[r] && bits[inst * rows + r];
            if (!is_double[r] && !is_add) {
                std::memset(cell, 0, sizeof(uint64_t) * 640);
                for (int s = 634; s < 640; s++) cell[s] = 1;
                continue;
            }
            int64_t lam[2][N16], zero_pol[2][WIDE], nx_pol[2][WIDE];
            ModOut wz[2], wx[2], wy[2];
            const int64_t ecode = inst * rows + r + 1;
            if (is_double[r]) {
                // lam = 3 x^2 * (2y)^-1 over Fq2
                int64_t two_y[2][N16], ty_red[2][N16];
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < N16; i++) two_y[c][i] = 2 * ay[c][i];
                uint16_t red[N16];
                for (int c = 0; c < 2; c++) {
                    poly_mod_p(two_y[c], N16, red);
                    u16_to_i64(red, ty_red[c]);
                }
                int64_t inv2y[2][N16];
                if (fq2_inv_rows(ty_red, inv2y)) { err.store(ecode); return; }
                int64_t x_sq[2][WIDE];
                fq2_conv_rows(ax, ax, x_sq);
                int64_t sq3[2][N16];
                for (int c = 0; c < 2; c++) {
                    int64_t t[WIDE];
                    for (int i = 0; i < WIDE; i++) t[i] = 3 * x_sq[c][i];
                    poly_mod_p(t, WIDE, red);
                    u16_to_i64(red, sq3[c]);
                }
                int64_t lam_w[2][WIDE];
                fq2_conv_rows(sq3, inv2y, lam_w);
                for (int c = 0; c < 2; c++) {
                    poly_mod_p(lam_w[c], WIDE, red);
                    u16_to_i64(red, lam[c]);
                }
                int64_t lam_y[2][WIDE];
                fq2_conv_rows(lam, ay, lam_y);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < WIDE; i++)
                        zero_pol[c][i] = 2 * lam_y[c][i] - 3 * x_sq[c][i];
                int64_t lam_sq[2][WIDE];
                fq2_conv_rows(lam, lam, lam_sq);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < WIDE; i++)
                        nx_pol[c][i] =
                            lam_sq[c][i] - (i < N16 ? 2 * ax[c][i] : 0);
                if (g2_finish(lam, ax, ay, zero_pol, nx_pol, wz, wx, wy)) {
                    err.store(ecode);
                    return;
                }
                pack_g2_cells(lam, wz, wx, wy, cell);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < N16; i++) {
                        ax[c][i] = wx[c].out[i];
                        ay[c][i] = wy[c].out[i];
                    }
            } else {
                // lam = (by - ay) * (bx - ax)^-1 over Fq2
                int64_t dx[2][N16], dy[2][N16], dx_red[2][N16],
                    dy_red[2][N16];
                uint16_t red[N16];
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < N16; i++) {
                        dx[c][i] = bx[c][i] - ax[c][i];
                        dy[c][i] = by[c][i] - ay[c][i];
                    }
                for (int c = 0; c < 2; c++) {
                    poly_mod_p(dx[c], N16, red);
                    u16_to_i64(red, dx_red[c]);
                    poly_mod_p(dy[c], N16, red);
                    u16_to_i64(red, dy_red[c]);
                }
                int64_t inv_dx[2][N16];
                if (fq2_inv_rows(dx_red, inv_dx)) { err.store(ecode); return; }  // x1==x2
                int64_t lam_w[2][WIDE];
                fq2_conv_rows(dy_red, inv_dx, lam_w);
                for (int c = 0; c < 2; c++) {
                    poly_mod_p(lam_w[c], WIDE, red);
                    u16_to_i64(red, lam[c]);
                }
                int64_t lam_dx[2][WIDE];
                fq2_conv_rows(lam, dx, lam_dx);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < WIDE; i++)
                        zero_pol[c][i] =
                            lam_dx[c][i] - (i < N16 ? dy[c][i] : 0);
                int64_t lam_sq[2][WIDE];
                fq2_conv_rows(lam, lam, lam_sq);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < WIDE; i++)
                        nx_pol[c][i] =
                            lam_sq[c][i] -
                            (i < N16 ? ax[c][i] + bx[c][i] : 0);
                if (g2_finish(lam, ax, ay, zero_pol, nx_pol, wz, wx, wy)) {
                    err.store(ecode);
                    return;
                }
                pack_g2_cells(lam, wz, wx, wy, cell);
                for (int c = 0; c < 2; c++)
                    for (int i = 0; i < N16; i++) {
                        bx[c][i] = wx[c].out[i];
                        by[c][i] = wy[c].out[i];
                    }
            }
        }
        for (int c = 0; c < 2; c++)
            for (int i = 0; i < N16; i++) {
                final_bx[inst * C2 + c * N16 + i] = (uint16_t)bx[c][i];
                final_by[inst * C2 + c * N16 + i] = (uint16_t)by[c][i];
            }
    }
    };  // run_range
    int64_t nt = std::min<int64_t>(
        n, native_threads());
    if (nt <= 1) {
        run_range(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n + nt - 1) / nt;
        for (int64_t t = 0; t < nt; t++) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run_range, lo, hi);
        }
        for (auto& th : ts) th.join();
    }
    return err.load();
}

// Histogram of u16-valued cells across a strided u64 trace view — the
// logUp range-check multiplicity column (gadgets/range_check.py:
// generate_logup_u16_range_check) without the 3x ~200 MB numpy copies
// (fancy-index + astype + ravel measured 1.9 s of a 2.2 s tracegen).
// base points at row 0 / col 0 of the view; row_stride in ELEMENTS;
// cols are column indices into the view. out must hold 65536 int64.
// Returns 0, or 1 + flat index of the first cell >= 2^16.
int64_t hist_u16_cols(const uint64_t* base, int64_t n_rows,
                      int64_t row_stride, const int64_t* cols,
                      int64_t n_cols, int64_t* out) {
    int64_t nt = std::min<int64_t>(
        std::max<int64_t>(1, n_rows / 4096),
        native_threads());
    std::vector<std::vector<int64_t>> hists(nt);
    std::atomic<int64_t> err(0);
    auto run_range = [&](int64_t t, int64_t lo, int64_t hi) {
        auto& h = hists[t];
        h.assign(65536, 0);
        for (int64_t r = lo; r < hi && !err.load(std::memory_order_relaxed);
             r++) {
            const uint64_t* row = base + r * row_stride;
            for (int64_t c = 0; c < n_cols; c++) {
                uint64_t v = row[cols[c]];
                if (v >= 65536) {
                    err.store(r * n_cols + c + 1);
                    return;
                }
                h[v]++;
            }
        }
    };
    if (nt <= 1) {
        run_range(0, 0, n_rows);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n_rows + nt - 1) / nt;
        for (int64_t t = 0; t < nt; t++) {
            int64_t lo = t * chunk, hi = std::min(n_rows, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back(run_range, t, lo, hi);
        }
        for (auto& th : ts) th.join();
    }
    if (int64_t e = err.load()) return e;
    for (int64_t v = 0; v < 65536; v++) {
        int64_t s = 0;
        for (auto& h : hists)
            if (!h.empty()) s += h[v];
        out[v] = s;
    }
    return 0;
}

}  // extern "C"
