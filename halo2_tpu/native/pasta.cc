// Native host curve arithmetic for the Pallas/Vesta (pasta) curves.
//
// The reference implements its compute layer in native Rust
// (pasta_curves + halo2's arithmetic.rs); this is the TPU framework's
// native host-side analogue for the orchestration-path group ops that
// do not belong on the accelerator: keygen commitments at small n, the
// verifier's final MSM, IPA round collapses, SRS construction. The
// device (Pallas-kernel) MSM in ops/msm_pallas.py remains the bulk
// path. Exposed through a minimal C ABI consumed via ctypes
// (curves/native.py) — no pybind11 dependency.
//
// Field arithmetic: 4x64-limb Montgomery (CIOS) with runtime-provided
// constants (modulus, -p^-1 mod 2^64, R^2 mod p), so one compiled
// object serves both base fields. Curve ops: Jacobian (a=0, per
// pasta: y^2 = x^3 + 5), mixed addition for affine inputs, Pippenger
// bucket MSM matching best_multiexp's window choice
// (halo2_proofs/src/arithmetic.rs:143-180).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Field {
  u64 p[4];    // modulus, little-endian limbs
  u64 inv;     // -p^{-1} mod 2^64
  u64 r2[4];   // R^2 mod p  (R = 2^256)
  u64 one[4];  // R mod p (Montgomery 1)
};

static Field FIELDS[2];  // 0: Pallas base (Fp), 1: Vesta base (Fq)

typedef u64 fe[4];  // Montgomery-form field element

static inline bool gte_p(const Field& f, const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > f.p[i]) return true;
    if (a[i] < f.p[i]) return false;
  }
  return true;  // equal
}

static inline void sub_p(const Field& f, u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - f.p[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline void fadd(const Field& f, const u64 a[4], const u64 b[4],
                        u64 out[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || gte_p(f, out)) sub_p(f, out);
}

static inline void fsub(const Field& f, const u64 a[4], const u64 b[4],
                        u64 out[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)out[i] + f.p[i] + carry;
      out[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

// CIOS Montgomery multiplication.
static inline void fmul(const Field& f, const u64 a[4], const u64 b[4],
                        u64 out[4]) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a[j] * b[i] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);

    u64 m = t[0] * f.inv;
    carry = ((u128)m * f.p[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)m * f.p[j] + t[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + carry;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
    t[5] = 0;
  }
  out[0] = t[0]; out[1] = t[1]; out[2] = t[2]; out[3] = t[3];
  if (t[4] || gte_p(f, out)) sub_p(f, out);
}

static inline void fsqr(const Field& f, const u64 a[4], u64 out[4]) {
  fmul(f, a, a, out);
}

static inline bool fzero(const u64 a[4]) {
  return (a[0] | a[1] | a[2] | a[3]) == 0;
}

static inline void fcopy(u64 dst[4], const u64 src[4]) {
  memcpy(dst, src, 32);
}

static inline void to_mont(const Field& f, const u64 a[4], u64 out[4]) {
  fmul(f, a, f.r2, out);
}

static inline void from_mont(const Field& f, const u64 a[4], u64 out[4]) {
  u64 one_raw[4] = {1, 0, 0, 0};
  fmul(f, a, one_raw, out);
}

// Fermat inversion a^(p-2); p provided at runtime so just square&mul.
static void finv(const Field& f, const u64 a[4], u64 out[4]) {
  u64 e[4];  // exponent p-2
  const u64 two[4] = {2, 0, 0, 0};
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)f.p[i] - two[i] - borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  fe acc;
  fcopy(acc, f.one);
  for (int limb = 3; limb >= 0; --limb) {
    for (int bit = 63; bit >= 0; --bit) {
      fsqr(f, acc, acc);
      if ((e[limb] >> bit) & 1) fmul(f, acc, a, acc);
    }
  }
  fcopy(out, acc);
}

// ---- Jacobian point ops (curve y^2 = x^3 + b, a = 0) ----
struct Jac {
  fe X, Y, Z;  // Z == 0 -> identity
};

static void jdouble(const Field& f, const Jac& Pin, Jac& Rout) {
  const Jac P = Pin;  // alias-safe
  Jac R;
  if (fzero(P.Z) || fzero(P.Y)) {
    memset(&Rout, 0, sizeof(Rout));
    return;
  }
  fe A, B, C, D, E, F2, t, t2;
  fsqr(f, P.X, A);
  fsqr(f, P.Y, B);
  fsqr(f, B, C);
  // D = 2((X+B)^2 - A - C)
  fadd(f, P.X, B, t);
  fsqr(f, t, t);
  fsub(f, t, A, t);
  fsub(f, t, C, t);
  fadd(f, t, t, D);
  // E = 3A
  fadd(f, A, A, E);
  fadd(f, E, A, E);
  fsqr(f, E, F2);
  // X3 = F - 2D
  fsub(f, F2, D, t);
  fsub(f, t, D, R.X);
  // Y3 = E(D - X3) - 8C
  fsub(f, D, R.X, t);
  fmul(f, E, t, t);
  fadd(f, C, C, t2);
  fadd(f, t2, t2, t2);
  fadd(f, t2, t2, t2);
  fsub(f, t, t2, R.Y);
  // Z3 = 2YZ
  fmul(f, P.Y, P.Z, t);
  fadd(f, t, t, R.Z);
  Rout = R;
}

static void jadd(const Field& f, const Jac& Pin, const Jac& Qin, Jac& Rout) {
  const Jac P = Pin, Q = Qin;  // alias-safe
  Jac R;
  if (fzero(P.Z)) { Rout = Q; return; }
  if (fzero(Q.Z)) { Rout = P; return; }
  fe Z1Z1, Z2Z2, U1, U2, S1, S2, H, r, HH, HHH, V, t;
  fsqr(f, P.Z, Z1Z1);
  fsqr(f, Q.Z, Z2Z2);
  fmul(f, P.X, Z2Z2, U1);
  fmul(f, Q.X, Z1Z1, U2);
  fmul(f, P.Y, Q.Z, t);  fmul(f, t, Z2Z2, S1);
  fmul(f, Q.Y, P.Z, t);  fmul(f, t, Z1Z1, S2);
  fsub(f, U2, U1, H);
  fsub(f, S2, S1, r);
  if (fzero(H)) {
    if (fzero(r)) { jdouble(f, P, Rout); return; }
    memset(&Rout, 0, sizeof(Rout));
    return;
  }
  fsqr(f, H, HH);
  fmul(f, H, HH, HHH);
  fmul(f, U1, HH, V);
  fsqr(f, r, t);
  fsub(f, t, HHH, t);
  fsub(f, t, V, t);
  fsub(f, t, V, R.X);
  fsub(f, V, R.X, t);
  fmul(f, r, t, t);
  fe t2;
  fmul(f, S1, HHH, t2);
  fsub(f, t, t2, R.Y);
  fmul(f, P.Z, Q.Z, t);
  fmul(f, t, H, R.Z);
  Rout = R;
}

// [k] P for a Jacobian point, k given as raw little-endian 4x64 limbs.
static void jmul(const Field& f, const Jac& P, const u64 k4[4], Jac& out) {
  Jac acc;
  memset(&acc, 0, sizeof(acc));
  int top = 255;
  while (top >= 0 && !((k4[top / 64] >> (top % 64)) & 1)) --top;
  for (int bit = top; bit >= 0; --bit) {
    jdouble(f, acc, acc);
    if ((k4[bit / 64] >> (bit % 64)) & 1) jadd(f, acc, P, acc);
  }
  out = acc;
}

// P (Jacobian) + (x2, y2) affine Montgomery, q_inf marks identity Q.
static void jmixed(const Field& f, const Jac& Pin, const fe x2, const fe y2,
                   bool q_inf, Jac& Rout) {
  const Jac P = Pin;  // alias-safe
  Jac R;
  if (q_inf) { Rout = P; return; }
  if (fzero(P.Z)) {
    fcopy(Rout.X, x2); fcopy(Rout.Y, y2); fcopy(Rout.Z, f.one);
    return;
  }
  fe Z1Z1, U2, S2, H, r, HH, HHH, V, t, t2;
  fsqr(f, P.Z, Z1Z1);
  fmul(f, x2, Z1Z1, U2);
  fmul(f, y2, P.Z, t);  fmul(f, t, Z1Z1, S2);
  fsub(f, U2, P.X, H);
  fsub(f, S2, P.Y, r);
  if (fzero(H)) {
    if (fzero(r)) { jdouble(f, P, Rout); return; }
    memset(&Rout, 0, sizeof(Rout));
    return;
  }
  fsqr(f, H, HH);
  fmul(f, H, HH, HHH);
  fmul(f, P.X, HH, V);
  fsqr(f, r, t);
  fsub(f, t, HHH, t);
  fsub(f, t, V, t);
  fsub(f, t, V, R.X);
  fsub(f, V, R.X, t);
  fmul(f, r, t, t);
  fmul(f, P.Y, HHH, t2);
  fsub(f, t, t2, R.Y);
  fmul(f, P.Z, H, R.Z);
  Rout = R;
}

// Pippenger window width for n points (best_multiexp, arithmetic.rs:146-152).
static size_t msm_window(size_t n) {
  if (n < 4) return 1;
  if (n < 32) return 3;
  double ln = 0.0;
  for (size_t m = n; m > 1; m >>= 1) ln += 0.6931471805599453;
  size_t c = (size_t)(ln + 0.9999);
  if (c < 3) c = 3;
  if (c > 16) c = 16;
  return c;
}

// Pippenger MSM over Jacobian points with raw-LE scalars. Windows are
// independent, so they run on the OpenMP pool (the reference runs one
// rayon task per window, arithmetic.rs:156-167) and combine serially
// with c doublings between windows.
static void msm_jac(const Field& f, const u64* scalars, const Jac* pts,
                    size_t n, Jac& out) {
  size_t c = msm_window(n);
  size_t windows = 256 / c + 1;
  std::vector<Jac> winsums(windows);
#pragma omp parallel for schedule(dynamic, 1)
  for (size_t w = 0; w < windows; ++w) {
    std::vector<Jac> buckets((size_t(1) << c) - 1);
    for (auto& b : buckets) memset(&b, 0, sizeof(b));
    size_t shift = c * w;
    size_t limb = shift / 64, off = shift % 64;
    if (limb >= 4) {
      memset(&winsums[w], 0, sizeof(Jac));
      continue;
    }
    for (size_t i = 0; i < n; ++i) {
      u64 digit = scalars[4 * i + limb] >> off;
      if (off + c > 64 && limb + 1 < 4)
        digit |= scalars[4 * i + limb + 1] << (64 - off);
      digit &= (u64(1) << c) - 1;
      if (digit) jadd(f, buckets[digit - 1], pts[i], buckets[digit - 1]);
    }
    Jac running, winsum;
    memset(&running, 0, sizeof(running));
    memset(&winsum, 0, sizeof(winsum));
    for (size_t b = buckets.size(); b-- > 0;) {
      jadd(f, running, buckets[b], running);
      jadd(f, winsum, running, winsum);
    }
    winsums[w] = winsum;
  }
  Jac acc;
  memset(&acc, 0, sizeof(acc));
  for (size_t w = windows; w-- > 0;) {
    if (w != windows - 1)
      for (size_t d = 0; d < c; ++d) jdouble(f, acc, acc);
    jadd(f, acc, winsums[w], acc);
  }
  out = acc;
}

// Normalize one Jacobian point to raw affine output (+ inf flag).
static void jac_to_raw_affine(const Field& f, const Jac& P, u64 out_x[4],
                              u64 out_y[4], uint8_t* out_inf) {
  if (fzero(P.Z)) {
    *out_inf = 1;
    memset(out_x, 0, 32);
    memset(out_y, 0, 32);
    return;
  }
  *out_inf = 0;
  fe zinv, zinv2, t;
  finv(f, P.Z, zinv);
  fsqr(f, zinv, zinv2);
  fmul(f, P.X, zinv2, t);
  from_mont(f, t, out_x);
  fmul(f, zinv2, zinv, zinv2);
  fmul(f, P.Y, zinv2, t);
  from_mont(f, t, out_y);
}

// ---- IPA tail session --------------------------------------------------
//
// The prover's last IPA rounds (commitment/prover.rs:100-142) shrink by
// half each round with a Fiat-Shamir transcript squeeze between rounds —
// on the accelerator each tiny round costs a dispatch + tunnel readback,
// so below a crossover the Python driver hands the whole remaining state
// (p', b in the SCALAR field; G' on the curve over the BASE field) to
// this session once and runs the rounds natively. Single session at a
// time (the prover is sequential by Fiat-Shamir construction).

static struct {
  int bf;                    // base-field index (curve coordinates)
  int sf;                    // scalar-field index (p', b)
  size_t n;                  // current half-size boundary: vectors are n long
  std::vector<u64> p, b;     // scalar-field Montgomery, 4 limbs each
  std::vector<Jac> g;        // curve points, Jacobian Montgomery
} IPA;

extern "C" {

// Initialize field `idx` (0 or 1) with raw little-endian limbs.
void pasta_set_field(int idx, const u64 p[4], u64 inv, const u64 r2[4],
                     const u64 one_mont[4]) {
  Field& f = FIELDS[idx];
  memcpy(f.p, p, 32);
  f.inv = inv;
  memcpy(f.r2, r2, 32);
  memcpy(f.one, one_mont, 32);
}

// MSM: scalars raw LE 4x64 (reduced), points affine raw coordinates
// (STANDARD form, converted to Montgomery internally); infs[i] nonzero
// marks the identity. Result written as raw affine (x, y) + inf flag.
// Window schedule mirrors best_multiexp (arithmetic.rs:143-180).
void pasta_msm(int fidx, const u64* scalars, const u64* xs, const u64* ys,
               const uint8_t* infs, size_t n, u64 out_x[4], u64 out_y[4],
               uint8_t* out_inf) {
  const Field& f = FIELDS[fidx];
  // Montgomery-convert the points once.
  std::vector<u64> mx(4 * n), my(4 * n);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i) {
    to_mont(f, xs + 4 * i, &mx[4 * i]);
    to_mont(f, ys + 4 * i, &my[4 * i]);
  }
  size_t c = msm_window(n);
  size_t windows = 256 / c + 1;
  std::vector<Jac> winsums(windows);
#pragma omp parallel for schedule(dynamic, 1)
  for (size_t w = 0; w < windows; ++w) {
    std::vector<Jac> buckets((size_t(1) << c) - 1);
    for (auto& b : buckets) memset(&b, 0, sizeof(b));
    size_t shift = c * w;
    size_t limb = shift / 64, off = shift % 64;
    if (limb >= 4) {
      memset(&winsums[w], 0, sizeof(Jac));
      continue;
    }
    for (size_t i = 0; i < n; ++i) {
      if (infs[i]) continue;
      u64 digit = scalars[4 * i + limb] >> off;
      if (off + c > 64 && limb + 1 < 4)
        digit |= scalars[4 * i + limb + 1] << (64 - off);
      digit &= (u64(1) << c) - 1;
      if (digit)
        jmixed(f, buckets[digit - 1], &mx[4 * i], &my[4 * i], false,
               buckets[digit - 1]);
    }
    Jac running, winsum;
    memset(&running, 0, sizeof(running));
    memset(&winsum, 0, sizeof(winsum));
    for (size_t b = buckets.size(); b-- > 0;) {
      jadd(f, running, buckets[b], running);
      jadd(f, winsum, running, winsum);
    }
    winsums[w] = winsum;
  }
  Jac acc;
  memset(&acc, 0, sizeof(acc));
  for (size_t w = windows; w-- > 0;) {
    if (w != windows - 1)
      for (size_t d = 0; d < c; ++d) jdouble(f, acc, acc);
    jadd(f, acc, winsums[w], acc);
  }
  if (fzero(acc.Z)) {
    *out_inf = 1;
    memset(out_x, 0, 32);
    memset(out_y, 0, 32);
    return;
  }
  *out_inf = 0;
  fe zinv, zinv2, t;
  finv(f, acc.Z, zinv);
  fsqr(f, zinv, zinv2);
  fmul(f, acc.X, zinv2, t);
  from_mont(f, t, out_x);
  fmul(f, zinv2, zinv, zinv2);
  fmul(f, acc.Y, zinv2, t);
  from_mont(f, t, out_y);
}

// Convert raw affine coordinates to Montgomery once, so repeated MSMs
// over a fixed base set (the SRS g / g_lagrange vectors) skip the
// per-call conversion pass in pasta_msm.
void pasta_points_to_mont(int fidx, const u64* xs, const u64* ys, size_t n,
                          u64* mx, u64* my) {
  const Field& f = FIELDS[fidx];
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i) {
    to_mont(f, xs + 4 * i, &mx[4 * i]);
    to_mont(f, ys + 4 * i, &my[4 * i]);
  }
}

// m MSMs sharing one pre-Montgomery-packed point set (the commit_many
// pattern: a whole keygen/prover phase's commitments over the same SRS).
// scalars: m x n x 4 raw LE limbs, or Montgomery form of the scalar
// field `sfidx` when scalars_mont != 0 (converted out once here).
// Parallelism is over the flattened (msm, window) grid.
void pasta_msm_many(int fidx, int sfidx, size_t m, const u64* scalars,
                    int scalars_mont, const u64* mx, const u64* my,
                    const uint8_t* infs, size_t n, u64* out_x, u64* out_y,
                    uint8_t* out_inf) {
  const Field& f = FIELDS[fidx];
  std::vector<u64> raw;
  if (scalars_mont) {
    const Field& sf = FIELDS[sfidx];
    raw.resize(4 * m * n);
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < m * n; ++i)
      from_mont(sf, scalars + 4 * i, &raw[4 * i]);
    scalars = raw.data();
  }
  size_t c = msm_window(n);
  size_t windows = 256 / c + 1;
  std::vector<Jac> winsums(m * windows);
#pragma omp parallel for schedule(dynamic, 1)
  for (size_t jw = 0; jw < m * windows; ++jw) {
    size_t j = jw / windows, w = jw % windows;
    const u64* sc = scalars + 4 * n * j;
    std::vector<Jac> buckets((size_t(1) << c) - 1);
    for (auto& b : buckets) memset(&b, 0, sizeof(b));
    size_t shift = c * w;
    size_t limb = shift / 64, off = shift % 64;
    if (limb >= 4) {
      memset(&winsums[jw], 0, sizeof(Jac));
      continue;
    }
    for (size_t i = 0; i < n; ++i) {
      if (infs[i]) continue;
      u64 digit = sc[4 * i + limb] >> off;
      if (off + c > 64 && limb + 1 < 4)
        digit |= sc[4 * i + limb + 1] << (64 - off);
      digit &= (u64(1) << c) - 1;
      if (digit)
        jmixed(f, buckets[digit - 1], &mx[4 * i], &my[4 * i], false,
               buckets[digit - 1]);
    }
    Jac running, winsum;
    memset(&running, 0, sizeof(running));
    memset(&winsum, 0, sizeof(winsum));
    for (size_t b = buckets.size(); b-- > 0;) {
      jadd(f, running, buckets[b], running);
      jadd(f, winsum, running, winsum);
    }
    winsums[jw] = winsum;
  }
#pragma omp parallel for schedule(static)
  for (size_t j = 0; j < m; ++j) {
    Jac acc;
    memset(&acc, 0, sizeof(acc));
    for (size_t w = windows; w-- > 0;) {
      if (w != windows - 1)
        for (size_t d = 0; d < c; ++d) jdouble(f, acc, acc);
      jadd(f, acc, winsums[j * windows + w], acc);
    }
    jac_to_raw_affine(f, acc, out_x + 4 * j, out_y + 4 * j, out_inf + j);
  }
}

// Batch scalar-mul-and-add: out[i] = lo[i] + [k] hi[i], all affine raw;
// the IPA G' collapse (poly/commitment.rs::parallel_generator_collapse
// analogue). One shared batch inversion at the end.
void pasta_collapse(int fidx, const u64* k4, const u64* lo_x,
                    const u64* lo_y, const uint8_t* lo_inf, const u64* hi_x,
                    const u64* hi_y, const uint8_t* hi_inf, size_t n,
                    u64* out_x, u64* out_y, uint8_t* out_inf) {
  const Field& f = FIELDS[fidx];
  std::vector<Jac> res(n);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i) {
    Jac acc;
    memset(&acc, 0, sizeof(acc));
    if (!hi_inf[i]) {
      fe hx, hy;
      to_mont(f, hi_x + 4 * i, hx);
      to_mont(f, hi_y + 4 * i, hy);
      Jac base;
      fcopy(base.X, hx); fcopy(base.Y, hy); fcopy(base.Z, f.one);
      // double-and-add over k (raw LE limbs)
      for (int limb = 3; limb >= 0; --limb) {
        for (int bit = 63; bit >= 0; --bit) {
          jdouble(f, acc, acc);
          if ((k4[limb] >> bit) & 1) jadd(f, acc, base, acc);
        }
      }
    }
    if (!lo_inf[i]) {
      fe lx, ly;
      to_mont(f, lo_x + 4 * i, lx);
      to_mont(f, lo_y + 4 * i, ly);
      jmixed(f, acc, lx, ly, false, acc);
    }
    res[i] = acc;
  }
  // batch normalize (Montgomery trick)
  std::vector<u64> prefix(4 * (n + 1));
  fcopy(&prefix[0], f.one);
  for (size_t i = 0; i < n; ++i) {
    if (fzero(res[i].Z))
      fcopy(&prefix[4 * (i + 1)], &prefix[4 * i]);
    else
      fmul(f, &prefix[4 * i], res[i].Z, &prefix[4 * (i + 1)]);
  }
  fe inv;
  finv(f, &prefix[4 * n], inv);
  for (size_t i = n; i-- > 0;) {
    if (fzero(res[i].Z)) {
      out_inf[i] = 1;
      memset(out_x + 4 * i, 0, 32);
      memset(out_y + 4 * i, 0, 32);
      continue;
    }
    fe zinv, zinv2, t;
    fmul(f, inv, &prefix[4 * i], zinv);
    fmul(f, inv, res[i].Z, inv);
    fsqr(f, zinv, zinv2);
    fmul(f, res[i].X, zinv2, t);
    from_mont(f, t, out_x + 4 * i);
    fmul(f, zinv2, zinv, zinv2);
    fmul(f, res[i].Y, zinv2, t);
    from_mont(f, t, out_y + 4 * i);
    out_inf[i] = 0;
  }
}

// Begin an IPA tail session with n-element state. p/b are scalar-field
// elements in MONTGOMERY form (4x64 LE — the device's R = 2^256 matches
// this library's); gx/gy are base-field Montgomery affine coordinates
// with g_inf marking identities.
void pasta_ipa_begin(int base_fidx, int scalar_fidx, const u64* p_mont,
                     const u64* b_mont, const u64* gx, const u64* gy,
                     const uint8_t* g_inf, size_t n) {
  IPA.bf = base_fidx;
  IPA.sf = scalar_fidx;
  IPA.n = n;
  IPA.p.assign(p_mont, p_mont + 4 * n);
  IPA.b.assign(b_mont, b_mont + 4 * n);
  IPA.g.resize(n);
  const Field& f = FIELDS[base_fidx];
  for (size_t i = 0; i < n; ++i) {
    if (g_inf[i]) {
      memset(&IPA.g[i], 0, sizeof(Jac));
    } else {
      fcopy(IPA.g[i].X, gx + 4 * i);
      fcopy(IPA.g[i].Y, gy + 4 * i);
      fcopy(IPA.g[i].Z, f.one);
    }
  }
}

// One round's cross terms (commitment/prover.rs:100-123):
//   L = MSM(p'[half:], G'[:half]),  R = MSM(p'[:half], G'[half:])
//   value_l = <p'[half:], b[:half]>, value_r = <p'[:half], b[half:]>
// Outputs raw (non-Montgomery): affine L/R + inf flags, scalar values.
void pasta_ipa_round(u64 lx[4], u64 ly[4], uint8_t* linf, u64 rx[4],
                     u64 ry[4], uint8_t* rinf, u64 vl[4], u64 vr[4]) {
  const Field& bf = FIELDS[IPA.bf];
  const Field& sf = FIELDS[IPA.sf];
  size_t half = IPA.n / 2;
  // raw scalars for digit extraction
  std::vector<u64> raw(4 * half);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < half; ++i)
    from_mont(sf, &IPA.p[4 * (half + i)], &raw[4 * i]);
  Jac L;
  msm_jac(bf, raw.data(), IPA.g.data(), half, L);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < half; ++i)
    from_mont(sf, &IPA.p[4 * i], &raw[4 * i]);
  Jac R;
  msm_jac(bf, raw.data(), IPA.g.data() + half, half, R);
  jac_to_raw_affine(bf, L, lx, ly, linf);
  jac_to_raw_affine(bf, R, rx, ry, rinf);
  fe accl, accr, t;
  memset(accl, 0, 32);
  memset(accr, 0, 32);
  for (size_t i = 0; i < half; ++i) {
    fmul(sf, &IPA.p[4 * (half + i)], &IPA.b[4 * i], t);
    fadd(sf, accl, t, accl);
    fmul(sf, &IPA.p[4 * i], &IPA.b[4 * (half + i)], t);
    fadd(sf, accr, t, accr);
  }
  from_mont(sf, accl, vl);
  from_mont(sf, accr, vr);
}

// Fold after the round challenge (commitment/prover.rs:125-142):
//   p' = p'_lo + u^-1 p'_hi ; b = b_lo + u b_hi ; G' = G'_lo + [u] G'_hi
// u / u_inv raw LE.
void pasta_ipa_fold(const u64 u_raw[4], const u64 uinv_raw[4]) {
  const Field& bf = FIELDS[IPA.bf];
  const Field& sf = FIELDS[IPA.sf];
  size_t half = IPA.n / 2;
  fe u_m, uinv_m, t;
  to_mont(sf, u_raw, u_m);
  to_mont(sf, uinv_raw, uinv_m);
#pragma omp parallel for schedule(static) private(t)
  for (size_t i = 0; i < half; ++i) {
    fmul(sf, &IPA.p[4 * (half + i)], uinv_m, t);
    fadd(sf, &IPA.p[4 * i], t, &IPA.p[4 * i]);
    fmul(sf, &IPA.b[4 * (half + i)], u_m, t);
    fadd(sf, &IPA.b[4 * i], t, &IPA.b[4 * i]);
  }
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < half; ++i) {
    Jac hi_mul;
    jmul(bf, IPA.g[half + i], u_raw, hi_mul);
    jadd(bf, IPA.g[i], hi_mul, IPA.g[i]);
  }
  IPA.n = half;
}

// Final collapsed scalar c = p'[0], raw.
void pasta_ipa_final(u64 c[4]) {
  from_mont(FIELDS[IPA.sf], &IPA.p[0], c);
}

// ---- GLV endomorphism acceleration ---------------------------------------
// The pasta curves have the cube-root endomorphism phi(x, y) =
// (zeta_base * x, y) acting as multiplication by lambda = zeta_scalar;
// a fixed 255-bit scalar splits as k = k1 + k2*lambda with
// |k1|, |k2| < 2^128 (decomposition done by the Python caller with
// exact bigints), so a point multiply becomes a 128-bit interleaved
// double-and-add over {P, phi(P), P + phi(P)} — ~1.6x fewer group ops
// than the plain 255-bit ladder. Used for the IPA G' fold, where one
// challenge multiplies half the basis vector every round.

static fe ENDO_ZETA[2];
static bool ENDO_READY[2] = {false, false};

void pasta_set_endo(int cidx, const u64 zeta_base_raw[4]) {
  to_mont(FIELDS[cidx], zeta_base_raw, ENDO_ZETA[cidx]);
  ENDO_READY[cidx] = true;
}

// out = [k1] P + [k2] phi(P); k1/k2 as |.| in 2x64 LE limbs + sign flags.
static void jmul_glv(const Field& f, const fe zeta, const Jac& P,
                     const u64 k1[2], int neg1, const u64 k2[2], int neg2,
                     Jac& out) {
  Jac A = P, B;
  if (neg1 && !fzero(A.Z)) {
    fe z0;
    memset(z0, 0, 32);
    fsub(f, z0, A.Y, A.Y);
  }
  fmul(f, P.X, zeta, B.X);
  fcopy(B.Y, P.Y);
  fcopy(B.Z, P.Z);
  if (neg2 && !fzero(B.Z)) {
    fe z0;
    memset(z0, 0, 32);
    fsub(f, z0, B.Y, B.Y);
  }
  Jac AB;
  jadd(f, A, B, AB);
  int top = 127;
  while (top >= 0 && !(((k1[top / 64] | k2[top / 64]) >> (top % 64)) & 1))
    --top;
  Jac acc;
  memset(&acc, 0, sizeof(acc));
  for (int bit = top; bit >= 0; --bit) {
    jdouble(f, acc, acc);
    int b1 = (k1[bit / 64] >> (bit % 64)) & 1;
    int b2 = (k2[bit / 64] >> (bit % 64)) & 1;
    if (b1 && b2)
      jadd(f, acc, AB, acc);
    else if (b1)
      jadd(f, acc, A, acc);
    else if (b2)
      jadd(f, acc, B, acc);
  }
  out = acc;
}

// IPA fold with a GLV-decomposed challenge for the G' collapse
// (p'/b folds take the plain u/u_inv exactly as pasta_ipa_fold).
void pasta_ipa_fold_glv(const u64 u_raw[4], const u64 uinv_raw[4],
                        const u64 k1[2], int neg1, const u64 k2[2],
                        int neg2) {
  const Field& bf = FIELDS[IPA.bf];
  const Field& sf = FIELDS[IPA.sf];
  const fe& zeta = ENDO_ZETA[IPA.bf];
  size_t half = IPA.n / 2;
  fe u_m, uinv_m, t;
  to_mont(sf, u_raw, u_m);
  to_mont(sf, uinv_raw, uinv_m);
#pragma omp parallel for schedule(static) private(t)
  for (size_t i = 0; i < half; ++i) {
    fmul(sf, &IPA.p[4 * (half + i)], uinv_m, t);
    fadd(sf, &IPA.p[4 * i], t, &IPA.p[4 * i]);
    fmul(sf, &IPA.b[4 * (half + i)], u_m, t);
    fadd(sf, &IPA.b[4 * i], t, &IPA.b[4 * i]);
  }
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < half; ++i) {
    Jac hi_mul;
    jmul_glv(bf, zeta, IPA.g[half + i], k1, neg1, k2, neg2, hi_mul);
    jadd(bf, IPA.g[i], hi_mul, IPA.g[i]);
  }
  IPA.n = half;
}

// ---- NTT ----------------------------------------------------------------
// In-place radix-2 NTT over MONTGOMERY-form data: iterative Cooley-Tukey
// with bit-reversal — the same math as best_fft (arithmetic.rs:192-255);
// field ops are exact, so any schedule is bit-identical to the
// reference's fork-join order. omega: primitive n-th root, Montgomery.
// Used for the keygen/small-k interactive path; the device Pallas
// butterfly kernels remain the bulk path.
void pasta_ntt(int fidx, u64* data, size_t n, const u64 omega_mont[4]) {
  const Field& f = FIELDS[fidx];
  int logn = 0;
  while ((size_t(1) << logn) < n) ++logn;
  for (size_t i = 0; i < n; ++i) {
    size_t r = 0;
    for (int b = 0; b < logn; ++b) r |= ((i >> b) & 1) << (logn - 1 - b);
    if (r > i)
      for (int l = 0; l < 4; ++l) {
        u64 tmp = data[4 * i + l];
        data[4 * i + l] = data[4 * r + l];
        data[4 * r + l] = tmp;
      }
  }
  if (n < 2) return;
  std::vector<u64> tw(4 * (n / 2));
  fcopy(&tw[0], f.one);
  for (size_t j = 1; j < n / 2; ++j)
    fmul(f, &tw[4 * (j - 1)], omega_mont, &tw[4 * j]);
  for (size_t m = 2; m <= n; m <<= 1) {
    size_t half = m / 2, step = n / m, pairs = n / 2;
#pragma omp parallel for schedule(static)
    for (size_t idx = 0; idx < pairs; ++idx) {
      size_t blk = idx / half, j = idx % half;
      u64* lo = data + 4 * (blk * m + j);
      u64* hi = data + 4 * (blk * m + j + half);
      fe t;
      fmul(f, hi, &tw[4 * (j * step)], t);
      fsub(f, lo, t, hi);
      fadd(f, lo, t, lo);
    }
  }
}

// ---- generic modular pow (4x64 raw exponent, Montgomery base) ------------
static void fpow(const Field& f, const fe a, const u64 e[4], fe out) {
  fe acc;
  fcopy(acc, f.one);
  int top = 255;
  while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) --top;
  for (int bit = top; bit >= 0; --bit) {
    fsqr(f, acc, acc);
    if ((e[bit / 64] >> (bit % 64)) & 1) fmul(f, acc, a, acc);
  }
  fcopy(out, acc);
}

static inline bool feq(const u64 a[4], const u64 b[4]) {
  return a[0] == b[0] && a[1] == b[1] && a[2] == b[2] && a[3] == b[3];
}

// ---- BLAKE2b-512 (RFC 7693; unkeyed) -------------------------------------
// Used by expand_message_xmd for hash_to_curve / SRS generation —
// byte-identical to hashlib.blake2b(digest_size=64).
static const u64 B2B_IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

static const uint8_t B2B_SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline u64 rotr64(u64 x, int n) { return (x >> n) | (x << (64 - n)); }

static void b2b_compress(u64 h[8], const uint8_t block[128], u64 t0,
                         bool last) {
  u64 m[16], v[16];
  for (int i = 0; i < 16; ++i) {
    m[i] = 0;
    for (int j = 7; j >= 0; --j) m[i] = (m[i] << 8) | block[8 * i + j];
  }
  for (int i = 0; i < 8; ++i) v[i] = h[i];
  for (int i = 0; i < 8; ++i) v[8 + i] = B2B_IV[i];
  v[12] ^= t0;
  if (last) v[14] = ~v[14];
#define B2B_G(a, b, c, d, x, y)            \
  v[a] = v[a] + v[b] + (x);                \
  v[d] = rotr64(v[d] ^ v[a], 32);          \
  v[c] = v[c] + v[d];                      \
  v[b] = rotr64(v[b] ^ v[c], 24);          \
  v[a] = v[a] + v[b] + (y);                \
  v[d] = rotr64(v[d] ^ v[a], 16);          \
  v[c] = v[c] + v[d];                      \
  v[b] = rotr64(v[b] ^ v[c], 63);
  for (int r = 0; r < 12; ++r) {
    const uint8_t* s = B2B_SIGMA[r];
    B2B_G(0, 4, 8, 12, m[s[0]], m[s[1]]);
    B2B_G(1, 5, 9, 13, m[s[2]], m[s[3]]);
    B2B_G(2, 6, 10, 14, m[s[4]], m[s[5]]);
    B2B_G(3, 7, 11, 15, m[s[6]], m[s[7]]);
    B2B_G(0, 5, 10, 15, m[s[8]], m[s[9]]);
    B2B_G(1, 6, 11, 12, m[s[10]], m[s[11]]);
    B2B_G(2, 7, 8, 13, m[s[12]], m[s[13]]);
    B2B_G(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
#undef B2B_G
  for (int i = 0; i < 8; ++i) h[i] ^= v[i] ^ v[8 + i];
}

// One-shot blake2b-512 over a contiguous message.
static void blake2b512(const uint8_t* msg, size_t len, uint8_t out[64]) {
  u64 h[8];
  for (int i = 0; i < 8; ++i) h[i] = B2B_IV[i];
  h[0] ^= 0x01010040ULL;  // depth=1, fanout=1, outlen=64
  size_t off = 0;
  while (len - off > 128) {
    b2b_compress(h, msg + off, (u64)(off + 128), false);
    off += 128;
  }
  uint8_t block[128];
  memset(block, 0, 128);
  memcpy(block, msg + off, len - off);
  b2b_compress(h, block, (u64)len, true);
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j) out[8 * i + j] = (uint8_t)(h[i] >> (8 * j));
}

// ---- SSWU hash-to-curve (pasta_curves hashtocurve.rs; curves/sswu.py) ----
// Constants arrive from Python in raw form at init; everything below is
// field-op identical to the host-Python oracle in curves/sswu.py.
struct SswuCtx {
  fe iso_a, iso_b, z, ker_x, velu_t, velu_u, inv9, inv27;  // Montgomery
  fe x1_den0;     // B / (Z*A), the den==0 branch of map_to_curve
  fe neg_b_a;     // -B / A
  fe root;        // ROOT_OF_UNITY (2^S-th root), Montgomery
  fe r3;          // R^3 mod p, for from_uniform_bytes' high half
  u64 t_m1_2[4];  // (t-1)/2 raw, p - 1 = 2^S * t with t odd
  int s;
  bool init;
};
static SswuCtx SSWU[2];

// Tonelli–Shanks square root. Returns false if `a` is a non-residue.
static bool fsqrt(const Field& f, const SswuCtx& c, const fe a, fe out) {
  if (fzero(a)) {
    memset(out, 0, 32);
    return true;
  }
  fe w, x, b, zr;
  fpow(f, a, c.t_m1_2, w);   // a^((t-1)/2)
  fmul(f, a, w, x);          // a^((t+1)/2)
  fmul(f, x, w, b);          // a^t
  fcopy(zr, c.root);
  int v = c.s;
  while (!feq(b, f.one)) {
    int k = 0;
    fe tmp;
    fcopy(tmp, b);
    while (!feq(tmp, f.one)) {
      fsqr(f, tmp, tmp);
      if (++k > 64) return false;  // safety: not in the 2-Sylow subgroup
    }
    if (k >= v) return false;  // b has full 2^v order -> non-residue
    fe wz;
    fcopy(wz, zr);
    for (int i = 0; i < v - k - 1; ++i) fsqr(f, wz, wz);
    fmul(f, x, wz, x);
    fsqr(f, wz, zr);
    fmul(f, b, zr, b);
    v = k;
  }
  fe chk;
  fsqr(f, x, chk);
  if (!feq(chk, a)) return false;
  fcopy(out, x);
  return true;
}

// 64 uniform bytes (big-endian, i.e. the pasta chunk-reversal quirk already
// applied by reading BE) -> Montgomery field element: (d0 + d1*2^256) mod p.
static void from_uniform_be64(const Field& f, const SswuCtx& c,
                              const uint8_t bytes[64], fe out) {
  u64 d[8];  // little-endian limbs of the BE-interpreted integer
  for (int i = 0; i < 8; ++i) {
    u64 v = 0;
    for (int j = 0; j < 8; ++j) v = (v << 8) | bytes[64 - 8 * (i + 1) + j];
    d[i] = v;
  }
  fe lo, hi;
  fmul(f, d, f.r2, lo);       // d0 * R
  fmul(f, d + 4, c.r3, hi);   // d1 * R^2 = (d1 * 2^256) * R
  fadd(f, lo, hi, out);
}

// map_to_curve_simple_swu onto the iso-curve (curves/sswu.py::map_to_iso).
static void sswu_map_to_iso(const Field& f, const SswuCtx& c, const fe u,
                            fe ox, fe oy) {
  fe tv1, tv2, den, x1, gx, y, t;
  fsqr(f, u, tv1);
  fmul(f, c.z, tv1, tv1);      // Z u^2
  fsqr(f, tv1, tv2);           // Z^2 u^4
  fadd(f, tv1, tv2, den);
  if (fzero(den)) {
    fcopy(x1, c.x1_den0);
  } else {
    finv(f, den, t);
    fadd(f, t, f.one, t);
    fmul(f, c.neg_b_a, t, x1);
  }
  // g(x1) = x1^3 + A x1 + B
  fsqr(f, x1, gx);
  fmul(f, gx, x1, gx);
  fmul(f, c.iso_a, x1, t);
  fadd(f, gx, t, gx);
  fadd(f, gx, c.iso_b, gx);
  fe x;
  if (fsqrt(f, c, gx, y)) {
    fcopy(x, x1);
  } else {
    fmul(f, tv1, x1, x);       // x2 = Z u^2 x1
    fsqr(f, x, gx);
    fmul(f, gx, x, gx);
    fmul(f, c.iso_a, x, t);
    fadd(f, gx, t, gx);
    fadd(f, gx, c.iso_b, gx);
    fsqrt(f, c, gx, y);        // must be square now
  }
  // sgn0 parity match between raw u and raw y
  u64 uraw[4], yraw[4];
  from_mont(f, u, uraw);
  from_mont(f, y, yraw);
  if ((yraw[0] & 1) != (uraw[0] & 1)) {
    fe ny;
    memset(ny, 0, 32);
    fsub(f, ny, y, y);
  }
  fcopy(ox, x);
  fcopy(oy, y);
}

// Affine addition on the iso-curve E': y^2 = x^3 + a x + b (a != 0).
// inf flags mark identity; returns via out/out_inf.
static void iso_affine_add(const Field& f, const fe a_coef, const fe x1,
                           const fe y1, bool i1, const fe x2, const fe y2,
                           bool i2, fe ox, fe oy, bool* oinf) {
  if (i1) { fcopy(ox, x2); fcopy(oy, y2); *oinf = i2; return; }
  if (i2) { fcopy(ox, x1); fcopy(oy, y1); *oinf = i1; return; }
  fe lam, t, t2;
  if (feq(x1, x2)) {
    fe s;
    fadd(f, y1, y2, s);
    if (fzero(s)) { *oinf = true; memset(ox, 0, 32); memset(oy, 0, 32); return; }
    // lam = (3 x1^2 + a) / (2 y1)
    fsqr(f, x1, t);
    fadd(f, t, t, t2);
    fadd(f, t2, t, t2);
    fadd(f, t2, a_coef, t2);
    fadd(f, y1, y1, t);
    finv(f, t, t);
    fmul(f, t2, t, lam);
  } else {
    fsub(f, y2, y1, t2);
    fsub(f, x2, x1, t);
    finv(f, t, t);
    fmul(f, t2, t, lam);
  }
  fe x3, y3;
  fsqr(f, lam, x3);
  fsub(f, x3, x1, x3);
  fsub(f, x3, x2, x3);
  fsub(f, x1, x3, t);
  fmul(f, lam, t, y3);
  fsub(f, y3, y1, y3);
  fcopy(ox, x3);
  fcopy(oy, y3);
  *oinf = false;
}

// Degree-3 isogeny E' -> E (curves/sswu.py::iso_map).
static void iso_map(const Field& f, const SswuCtx& c, const fe x, const fe y,
                    bool inf, fe ox, fe oy, bool* oinf) {
  if (inf) { *oinf = true; memset(ox, 0, 32); memset(oy, 0, 32); return; }
  fe d, dinv, dinv2, X, Xp, t;
  fsub(f, x, c.ker_x, d);
  if (fzero(d)) { *oinf = true; memset(ox, 0, 32); memset(oy, 0, 32); return; }
  finv(f, d, dinv);
  fsqr(f, dinv, dinv2);
  // X = x + t*dinv + u*dinv^2
  fmul(f, c.velu_t, dinv, X);
  fadd(f, X, x, X);
  fmul(f, c.velu_u, dinv2, t);
  fadd(f, X, t, X);
  // X' = 1 - t*dinv^2 - 2u*dinv^3
  fmul(f, c.velu_t, dinv2, Xp);
  fe one_;
  fcopy(one_, f.one);
  fsub(f, one_, Xp, Xp);
  fmul(f, dinv2, dinv, t);
  fmul(f, c.velu_u, t, t);
  fadd(f, t, t, t);
  fsub(f, Xp, t, Xp);
  fmul(f, X, c.inv9, ox);
  fmul(f, y, Xp, t);
  fmul(f, t, c.inv27, oy);
  *oinf = false;
}

// expand_message_xmd(msg, dst, 128) with BLAKE2b-512 (RFC 9380 §5.3.1),
// then two reversed-chunk field reductions + SSWU + iso add + isogeny.
static void hash_to_curve_one(const Field& f, const SswuCtx& c,
                              const uint8_t* dst, size_t dst_len,
                              const uint8_t* msg, size_t msg_len,
                              u64 ox[4], u64 oy[4], uint8_t* oinf) {
  // b0 = H(z_pad || msg || l_i_b || 0x00 || dst')
  uint8_t buf[128 + 64 + 3 + 256];
  size_t off = 0;
  memset(buf, 0, 128);
  off = 128;
  memcpy(buf + off, msg, msg_len);
  off += msg_len;
  buf[off++] = 0;  // len_in_bytes = 128 big-endian
  buf[off++] = 128;
  buf[off++] = 0;  // i = 0
  memcpy(buf + off, dst, dst_len);
  off += dst_len;
  buf[off++] = (uint8_t)dst_len;
  uint8_t b0[64], b1[64], b2[64];
  blake2b512(buf, off, b0);
  // b1 = H(b0 || 0x01 || dst')
  memcpy(buf, b0, 64);
  buf[64] = 1;
  memcpy(buf + 65, dst, dst_len);
  buf[65 + dst_len] = (uint8_t)dst_len;
  blake2b512(buf, 66 + dst_len, b1);
  // b2 = H((b0^b1) || 0x02 || dst')
  for (int i = 0; i < 64; ++i) buf[i] = b0[i] ^ b1[i];
  buf[64] = 2;
  blake2b512(buf, 66 + dst_len, b2);

  fe u0, u1, qx0, qy0, qx1, qy1, sx, sy, rx, ry;
  from_uniform_be64(f, c, b1, u0);
  from_uniform_be64(f, c, b2, u1);
  sswu_map_to_iso(f, c, u0, qx0, qy0);
  sswu_map_to_iso(f, c, u1, qx1, qy1);
  bool sinf, rinf;
  iso_affine_add(f, c.iso_a, qx0, qy0, false, qx1, qy1, false, sx, sy, &sinf);
  iso_map(f, c, sx, sy, sinf, rx, ry, &rinf);
  *oinf = rinf ? 1 : 0;
  if (rinf) {
    memset(ox, 0, 32);
    memset(oy, 0, 32);
  } else {
    from_mont(f, rx, ox);
    from_mont(f, ry, oy);
  }
}

// data[i] *= scale * base^(i mod period)   (period = 0 means base^i),
// all Montgomery. Covers the iFFT 1/n divisor (period=1), the zeta-coset
// distribution (period=3: 1, z, z^2 — domain.rs:357-373), and general
// power-distribution folds.
void pasta_powmul(int fidx, u64* data, size_t n, const u64 base_mont[4],
                  const u64 scale_mont[4], size_t period) {
  const Field& f = FIELDS[fidx];
  size_t m = period ? period : n;
  if (m > n) m = n;
  if (m == 0) return;
  std::vector<u64> pw(4 * m);
  fcopy(&pw[0], scale_mont);
  for (size_t j = 1; j < m; ++j)
    fmul(f, &pw[4 * (j - 1)], base_mont, &pw[4 * j]);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i)
    fmul(f, data + 4 * i, &pw[4 * (i % m)], data + 4 * i);
}

// Batch decompression of the reference's 32-byte point encoding
// (x LE with the y-parity bit in the top bit of byte 31): the SRS
// deserialization hot loop (Params::read, commitment.rs:179-205 via
// helpers.rs CurveRead). b_raw = curve constant b; flags[i]: 0 = ok,
// 1 = identity, 2 = invalid. Requires pasta_sswu_init (sqrt constants).
void pasta_decompress_many(int cidx, const uint8_t* data, const u64 b_raw[4],
                           size_t n, u64* out_x, u64* out_y,
                           uint8_t* flags) {
  const Field& f = FIELDS[cidx];
  const SswuCtx& c = SSWU[cidx];
  fe bm;
  to_mont(f, b_raw, bm);
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* p = data + 32 * i;
    u64 x[4];
    for (int l = 0; l < 4; ++l) {
      u64 v = 0;
      for (int j = 7; j >= 0; --j) v = (v << 8) | p[8 * l + j];
      x[l] = v;
    }
    int ysign = (int)((x[3] >> 63) & 1);
    x[3] &= ~(u64(1) << 63);
    // reject non-canonical x >= p
    bool lt = false;
    for (int l = 3; l >= 0; --l) {
      if (x[l] != f.p[l]) { lt = x[l] < f.p[l]; break; }
    }
    if (!lt) {
      flags[i] = 2;
      continue;
    }
    if (x[0] == 0 && x[1] == 0 && x[2] == 0 && x[3] == 0 && ysign == 0) {
      flags[i] = 1;
      memset(out_x + 4 * i, 0, 32);
      memset(out_y + 4 * i, 0, 32);
      continue;
    }
    fe xm, y2, y;
    to_mont(f, x, xm);
    fsqr(f, xm, y2);
    fmul(f, y2, xm, y2);
    fadd(f, y2, bm, y2);
    if (!fsqrt(f, c, y2, y)) {
      flags[i] = 2;
      continue;
    }
    u64 yraw[4];
    from_mont(f, y, yraw);
    if ((int)(yraw[0] & 1) != ysign) {
      // y = p - y (y != 0: x = 0 with b = 5 gives y2 = 5, a nonzero
      // square or rejected above; zero y2 implies x on the curve's
      // 2-torsion which pasta curves lack)
      u64 borrow = 0;
      for (int l = 0; l < 4; ++l) {
        u64 sub = yraw[l] + borrow;
        u64 ovf = (borrow && sub == 0) ? 1 : 0;
        u64 d = f.p[l] - sub;
        borrow = (u64)(ovf || f.p[l] < sub);
        yraw[l] = d;
      }
    }
    flags[i] = 0;
    memcpy(out_x + 4 * i, x, 32);
    memcpy(out_y + 4 * i, yraw, 32);
  }
}

// Initialize the SSWU context for curve `cidx` (= its base-field index).
// All inputs raw little-endian; (t-1)/2 and S define the Tonelli–Shanks
// decomposition p - 1 = 2^S * t.
void pasta_sswu_init(int cidx, const u64 iso_a[4], const u64 iso_b[4],
                     const u64 z[4], const u64 ker_x[4], const u64 velu_t[4],
                     const u64 velu_u[4], const u64 inv9[4],
                     const u64 inv27[4], const u64 root[4],
                     const u64 t_m1_2[4], int s) {
  const Field& f = FIELDS[cidx];
  SswuCtx& c = SSWU[cidx];
  to_mont(f, iso_a, c.iso_a);
  to_mont(f, iso_b, c.iso_b);
  to_mont(f, z, c.z);
  to_mont(f, ker_x, c.ker_x);
  to_mont(f, velu_t, c.velu_t);
  to_mont(f, velu_u, c.velu_u);
  to_mont(f, inv9, c.inv9);
  to_mont(f, inv27, c.inv27);
  to_mont(f, root, c.root);
  memcpy(c.t_m1_2, t_m1_2, 32);
  c.s = s;
  fmul(f, f.r2, f.r2, c.r3);  // R^3 mod p
  // x1_den0 = B / (Z*A); neg_b_a = -B / A
  fe t;
  fmul(f, c.z, c.iso_a, t);
  finv(f, t, t);
  fmul(f, c.iso_b, t, c.x1_den0);
  finv(f, c.iso_a, t);
  fmul(f, c.iso_b, t, c.neg_b_a);
  fe zero;
  memset(zero, 0, 32);
  fsub(f, zero, c.neg_b_a, c.neg_b_a);
  c.init = true;
}

// Hash one message to a curve point (raw affine out). msg_len <= 64.
void pasta_hash_to_curve(int cidx, const uint8_t* dst, size_t dst_len,
                         const uint8_t* msg, size_t msg_len, u64 ox[4],
                         u64 oy[4], uint8_t* oinf) {
  if (msg_len > 64 || dst_len > 255) { *oinf = 2; return; }
  hash_to_curve_one(FIELDS[cidx], SSWU[cidx], dst, dst_len, msg, msg_len,
                    ox, oy, oinf);
}

// The SRS generator vector: n points with msg = 0x00 || LE32(i)
// (poly/commitment.rs:38-74). Raw affine outputs.
void pasta_srs_g(int cidx, const uint8_t* dst, size_t dst_len, size_t n,
                 u64* ox, u64* oy, uint8_t* oinf) {
  const Field& f = FIELDS[cidx];
  const SswuCtx& c = SSWU[cidx];
#pragma omp parallel for schedule(dynamic, 64)
  for (size_t i = 0; i < n; ++i) {
    uint8_t msg[5] = {0, (uint8_t)i, (uint8_t)(i >> 8), (uint8_t)(i >> 16),
                      (uint8_t)(i >> 24)};
    hash_to_curve_one(f, c, dst, dst_len, msg, 5, ox + 4 * i, oy + 4 * i,
                      oinf + i);
  }
}

// Group-valued radix-2 NTT over curve points (commitment.rs:75-100's
// g_lagrange construction; same butterflies as best_fft but with point
// add and twiddle scalar-muls). Points raw affine in/out; omega and the
// final per-point scale factor are raw SCALAR-field values (pass
// scale = 1 to skip scaling). sfidx selects the scalar field for
// twiddle-table generation.
void pasta_group_ntt(int cidx, int sfidx, u64* xs, u64* ys, uint8_t* infs,
                     size_t n, const u64 omega_raw[4], const u64 scale_raw[4]) {
  const Field& f = FIELDS[cidx];
  const Field& sf = FIELDS[sfidx];
  int logn = 0;
  while ((size_t(1) << logn) < n) ++logn;
  // Jacobian working array, bit-reversed load.
  std::vector<Jac> pts(n);
  for (size_t i = 0; i < n; ++i) {
    size_t r = 0;
    for (int b = 0; b < logn; ++b) r |= ((i >> b) & 1) << (logn - 1 - b);
    if (infs[i]) {
      memset(&pts[r], 0, sizeof(Jac));
    } else {
      to_mont(f, xs + 4 * i, pts[r].X);
      to_mont(f, ys + 4 * i, pts[r].Y);
      fcopy(pts[r].Z, f.one);
    }
  }
  // raw twiddle table: omega^j for j < n/2 (scalar field)
  std::vector<u64> tw(n >= 2 ? 4 * (n / 2) : 4);
  {
    fe om, acc;
    to_mont(sf, omega_raw, om);
    fcopy(acc, sf.one);
    from_mont(sf, acc, &tw[0]);
    for (size_t j = 1; j < n / 2; ++j) {
      fmul(sf, acc, om, acc);
      from_mont(sf, acc, &tw[4 * j]);
    }
  }
  for (size_t m = 2; m <= n; m <<= 1) {
    size_t half = m / 2, step = n / m, pairs = n / 2;
#pragma omp parallel for schedule(static)
    for (size_t idx = 0; idx < pairs; ++idx) {
      size_t blk = idx / half, j = idx % half;
      Jac& lo = pts[blk * m + j];
      Jac& hi = pts[blk * m + j + half];
      Jac t;
      if (j == 0) {
        t = hi;
      } else {
        jmul(f, hi, &tw[4 * (j * step)], t);
      }
      Jac nlo, nhi;
      jadd(f, lo, t, nlo);
      // hi' = lo - t
      Jac negt = t;
      if (!fzero(negt.Z)) {
        fe z0;
        memset(z0, 0, 32);
        fsub(f, z0, negt.Y, negt.Y);
      }
      jadd(f, lo, negt, nhi);
      lo = nlo;
      hi = nhi;
    }
  }
  const u64 one_raw[4] = {1, 0, 0, 0};
  if (!feq(scale_raw, one_raw)) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; ++i) {
      Jac t;
      jmul(f, pts[i], scale_raw, t);
      pts[i] = t;
    }
  }
  // batch-normalize to raw affine
  std::vector<u64> prefix(4 * (n + 1));
  fcopy(&prefix[0], f.one);
  for (size_t i = 0; i < n; ++i) {
    if (fzero(pts[i].Z))
      fcopy(&prefix[4 * (i + 1)], &prefix[4 * i]);
    else
      fmul(f, &prefix[4 * i], pts[i].Z, &prefix[4 * (i + 1)]);
  }
  fe inv;
  finv(f, &prefix[4 * n], inv);
  for (size_t i = n; i-- > 0;) {
    if (fzero(pts[i].Z)) {
      infs[i] = 1;
      memset(xs + 4 * i, 0, 32);
      memset(ys + 4 * i, 0, 32);
      continue;
    }
    fe zinv, zinv2, t;
    fmul(f, inv, &prefix[4 * i], zinv);
    fmul(f, inv, pts[i].Z, inv);
    fsqr(f, zinv, zinv2);
    fmul(f, pts[i].X, zinv2, t);
    from_mont(f, t, xs + 4 * i);
    fmul(f, zinv2, zinv, zinv2);
    fmul(f, pts[i].Y, zinv2, t);
    from_mont(f, t, ys + 4 * i);
    infs[i] = 0;
  }
}

}  // extern "C"
