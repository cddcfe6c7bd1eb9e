/* BN254 (alt_bn128) G1/G2 multi-scalar multiplication — native backend for
 * the Groth16 wrap stage (zkmips_tpu/snark/groth16.py).
 *
 * The analog of the reference's gnark-crypto MSM (the Go side of
 * crates/recursion/gnark-ffi): the outer circuit has ~10^6 constraints, so
 * key generation and proving are MSM-bound; Python bigints do ~5 us/point-add
 * while this does ~100 ns.  Exposed via ctypes (snark/native.py):
 *
 *   zkm_bn254_g1_msm / zkm_bn254_g2_msm      Pippenger over affine inputs
 *   zkm_bn254_g1_mul_base_batch / g2_...     fixed-base window tables (setup)
 *
 * Point encoding at the boundary: canonical little-endian u64 limbs,
 * x then y (Fp2 coords x0,x1,y0,y1 for G2); scalars 32-byte little-endian.
 * Infinity flags are separate int32 arrays (1 = point at infinity).
 * Montgomery form is internal only.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint64_t u64;
typedef unsigned __int128 u128;

/* ------------------------------------------------------------------ Fp --- */

static const u64 FP_MOD[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 FP_N0 = 0x87d20782e4866389ULL;
static const u64 FP_R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL, 0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 FP_ONE[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};

typedef struct { u64 v[4]; } fp;

static inline int fp_is_zero(const fp *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static inline int fp_geq_mod(const u64 a[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > FP_MOD[i]) return 1;
        if (a[i] < FP_MOD[i]) return 0;
    }
    return 1; /* equal */
}

static inline void fp_sub_mod_raw(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - FP_MOD[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fp_add(fp *o, const fp *a, const fp *b) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->v[i] + b->v[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fp_geq_mod(t)) fp_sub_mod_raw(t);
    memcpy(o->v, t, 32);
}

static inline void fp_sub(fp *o, const fp *a, const fp *b) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + FP_MOD[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(o->v, t, 32);
}

static inline void fp_dbl(fp *o, const fp *a) { fp_add(o, a, a); }

static inline void fp_neg(fp *o, const fp *a) {
    if (fp_is_zero(a)) { memset(o->v, 0, 32); return; }
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)FP_MOD[i] - a->v[i] - borrow;
        o->v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

/* CIOS Montgomery multiplication. */
static void fp_mul(fp *o, const fp *a, const fp *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        u64 ai = a->v[i];
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)ai * b->v[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * FP_N0;
        carry = 0;
        u128 s0 = (u128)t[0] + (u128)m * FP_MOD[0];
        carry = s0 >> 64;
        for (int j = 1; j < 4; j++) {
            u128 sj = (u128)t[j] + (u128)m * FP_MOD[j] + carry;
            t[j - 1] = (u64)sj;
            carry = sj >> 64;
        }
        u128 s4 = (u128)t[4] + carry;
        t[3] = (u64)s4;
        t[4] = t[5] + (u64)(s4 >> 64);
        t[5] = 0;
    }
    if (t[4] || fp_geq_mod(t)) fp_sub_mod_raw(t);
    memcpy(o->v, t, 32);
}

static inline void fp_sqr(fp *o, const fp *a) { fp_mul(o, a, a); }

static void fp_from_canonical(fp *o, const u64 limbs[4]) {
    fp r2;
    memcpy(r2.v, FP_R2, 32);
    fp tmp;
    memcpy(tmp.v, limbs, 32);
    fp_mul(o, &tmp, &r2);
}

static void fp_to_canonical(u64 out[4], const fp *a) {
    fp one = {{1, 0, 0, 0}};
    fp t;
    fp_mul(&t, a, &one);
    memcpy(out, t.v, 32);
}

static void fp_inv(fp *o, const fp *a) {
    /* a^(p-2) via square-and-multiply (exponent = FP_MOD - 2) */
    u64 e[4];
    memcpy(e, FP_MOD, 32);
    e[0] -= 2; /* no borrow: low limb is odd and > 2 */
    fp base = *a, acc;
    memcpy(acc.v, FP_ONE, 32);
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) fp_mul(&acc, &acc, &base);
            fp_sqr(&base, &base);
            bits >>= 1;
        }
    }
    *o = acc;
}

/* ------------------------------------------------------------------ Fr ---
 * Scalar-field Montgomery arithmetic for the QAP FFTs (h-polynomial in
 * groth16.prove; crates' analog is gnark's fft package). */

static const u64 FR_MOD[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 FR_N0 = 0xc2e1f593efffffffULL;
static const u64 FR_R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL, 0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};
static const u64 FR_ONE[4] = {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL, 0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL};

typedef struct { u64 v[4]; } fr;

static inline int fr_geq_mod(const u64 a[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > FR_MOD[i]) return 1;
        if (a[i] < FR_MOD[i]) return 0;
    }
    return 1;
}

static inline void fr_sub_mod_raw(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - FR_MOD[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fr_add(fr *o, const fr *a, const fr *b) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->v[i] + b->v[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fr_geq_mod(t)) fr_sub_mod_raw(t);
    memcpy(o->v, t, 32);
}

static inline void fr_sub(fr *o, const fr *a, const fr *b) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + FR_MOD[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(o->v, t, 32);
}

static void fr_mul(fr *o, const fr *a, const fr *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        u64 ai = a->v[i];
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)ai * b->v[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * FR_N0;
        carry = 0;
        u128 s0 = (u128)t[0] + (u128)m * FR_MOD[0];
        carry = s0 >> 64;
        for (int j = 1; j < 4; j++) {
            u128 sj = (u128)t[j] + (u128)m * FR_MOD[j] + carry;
            t[j - 1] = (u64)sj;
            carry = sj >> 64;
        }
        u128 s4 = (u128)t[4] + carry;
        t[3] = (u64)s4;
        t[4] = t[5] + (u64)(s4 >> 64);
        t[5] = 0;
    }
    if (t[4] || fr_geq_mod(t)) fr_sub_mod_raw(t);
    memcpy(o->v, t, 32);
}

static void fr_pow(fr *o, const fr *a, const u64 e[4]) {
    fr base = *a, acc;
    memcpy(acc.v, FR_ONE, 32);
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) fr_mul(&acc, &acc, &base);
            fr_mul(&base, &base, &base);
            bits >>= 1;
        }
    }
    *o = acc;
}

static void fr_inv(fr *o, const fr *a) {
    u64 e[4];
    memcpy(e, FR_MOD, 32);
    e[0] -= 2;
    fr_pow(o, a, e);
}

/* In-place radix-2 DIT FFT over Fr.  vals: n*4 canonical LE limbs;
 * root: canonical primitive n-th root; inverse also scales by 1/n.
 * Twiddles are tabulated once; butterfly stages run OpenMP-parallel. */
void zkm_bn254_fr_fft2(u64 *vals, int64_t n, const u64 root_c[4], int32_t inverse,
                       int32_t mont_io) {
    fr r2; memcpy(r2.v, FR_R2, 32);
    fr root; memcpy(root.v, root_c, 32);
    fr_mul(&root, &root, &r2); /* to Montgomery */
    if (inverse) fr_inv(&root, &root);
    fr *v = (fr *)vals;
    if (!mont_io) {
        #pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; i++) fr_mul(&v[i], &v[i], &r2);
    }
    /* bit-reversal permutation */
    for (int64_t i = 1, j = 0; i < n; i++) {
        int64_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j |= bit;
        if (i < j) { fr t = v[i]; v[i] = v[j]; v[j] = t; }
    }
    /* tw[j] = root^j for j < n/2 */
    fr *tw = malloc(sizeof(fr) * (size_t)(n > 1 ? n / 2 : 1));
    memcpy(tw[0].v, FR_ONE, 32);
    for (int64_t j = 1; j < n / 2; j++) fr_mul(&tw[j], &tw[j - 1], &root);
    for (int64_t len = 2; len <= n; len <<= 1) {
        int64_t half = len / 2, stride = n / len;
        #pragma omp parallel for schedule(static) if (n >= 4096)
        for (int64_t idx = 0; idx < n / 2; idx++) {
            int64_t blk = idx / half, off = idx % half;
            int64_t k = blk * len + off;
            fr u = v[k], t;
            fr_mul(&t, &v[k + half], &tw[off * stride]);
            fr_add(&v[k], &u, &t);
            fr_sub(&v[k + half], &u, &t);
        }
    }
    free(tw);
    fr scale; memcpy(scale.v, FR_ONE, 32);
    if (inverse) {
        /* 1/n: n fits one limb for any practical domain */
        fr nf; memset(nf.v, 0, 32); nf.v[0] = (u64)n;
        fr_mul(&nf, &nf, &r2);
        fr_inv(&scale, &nf);
    }
    /* out of Montgomery (unless staying in the Montgomery domain) and the
     * inverse 1/n scale in one pass */
    if (!mont_io) {
        fr one = {{1, 0, 0, 0}};
        fr_mul(&scale, &scale, &one);
    }
    if (!mont_io || inverse) {
        #pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; i++) fr_mul(&v[i], &v[i], &scale);
    }
}

void zkm_bn254_fr_fft(u64 *vals, int64_t n, const u64 root_c[4], int32_t inverse) {
    zkm_bn254_fr_fft2(vals, n, root_c, inverse, 0);
}

/* Pointwise ops used by the coset-quotient step (groth16.prove). */
void zkm_bn254_fr_scale_pows(u64 *vals, int64_t n, const u64 g_c[4]) {
    /* vals[i] *= g^i (all canonical) */
    fr r2; memcpy(r2.v, FR_R2, 32);
    fr g; memcpy(g.v, g_c, 32);
    fr_mul(&g, &g, &r2);
    fr acc; memcpy(acc.v, FR_ONE, 32);
    fr one = {{1, 0, 0, 0}};
    fr *v = (fr *)vals;
    for (int64_t i = 0; i < n; i++) {
        fr t; memcpy(t.v, v[i].v, 32);
        fr_mul(&t, &t, &r2);
        fr_mul(&t, &t, &acc);
        fr_mul(&v[i], &t, &one);
        fr_mul(&acc, &acc, &g);
    }
}

void zkm_bn254_fr_mul_sub_scale(const u64 *a, const u64 *b, const u64 *c,
                                int64_t n, const u64 k_c[4], u64 *out) {
    /* out[i] = (a[i]*b[i] - c[i]) * k  (all canonical) */
    fr r2; memcpy(r2.v, FR_R2, 32);
    fr k; memcpy(k.v, k_c, 32);
    fr_mul(&k, &k, &r2);
    fr one = {{1, 0, 0, 0}};
    const fr *av = (const fr *)a, *bv = (const fr *)b, *cv = (const fr *)c;
    fr *ov = (fr *)out;
    for (int64_t i = 0; i < n; i++) {
        fr am, bm, cm, t;
        fr_mul(&am, &av[i], &r2);
        fr_mul(&bm, &bv[i], &r2);
        fr_mul(&cm, &cv[i], &r2);
        fr_mul(&t, &am, &bm);
        fr_sub(&t, &t, &cm);
        fr_mul(&t, &t, &k);
        fr_mul(&ov[i], &t, &one);
    }
}

/* ------------------------------------------------------------------ Fp2 --- */

typedef struct { fp c0, c1; } fp2;

static inline int fp2_is_zero(const fp2 *a) { return fp_is_zero(&a->c0) && fp_is_zero(&a->c1); }

static inline void fp2_add(fp2 *o, const fp2 *a, const fp2 *b) {
    fp_add(&o->c0, &a->c0, &b->c0);
    fp_add(&o->c1, &a->c1, &b->c1);
}

static inline void fp2_sub(fp2 *o, const fp2 *a, const fp2 *b) {
    fp_sub(&o->c0, &a->c0, &b->c0);
    fp_sub(&o->c1, &a->c1, &b->c1);
}

static inline void fp2_dbl(fp2 *o, const fp2 *a) { fp2_add(o, a, a); }

static inline void fp2_neg(fp2 *o, const fp2 *a) {
    fp_neg(&o->c0, &a->c0);
    fp_neg(&o->c1, &a->c1);
}

static void fp2_mul(fp2 *o, const fp2 *a, const fp2 *b) {
    fp t0, t1, s0, s1, r0;
    fp_mul(&t0, &a->c0, &b->c0);
    fp_mul(&t1, &a->c1, &b->c1);
    fp_add(&s0, &a->c0, &a->c1);
    fp_add(&s1, &b->c0, &b->c1);
    fp_sub(&r0, &t0, &t1);
    fp_mul(&s0, &s0, &s1);
    fp_sub(&s0, &s0, &t0);
    fp_sub(&s0, &s0, &t1);
    o->c0 = r0;
    o->c1 = s0;
}

static void fp2_sqr(fp2 *o, const fp2 *a) { fp2_mul(o, a, a); }

static void fp2_inv(fp2 *o, const fp2 *a) {
    fp t0, t1;
    fp_sqr(&t0, &a->c0);
    fp_sqr(&t1, &a->c1);
    fp_add(&t0, &t0, &t1);
    fp_inv(&t0, &t0);
    fp_mul(&o->c0, &a->c0, &t0);
    fp_mul(&t1, &a->c1, &t0);
    fp_neg(&o->c1, &t1);
}

/* --------------------------------------------------- generic group layer ---
 * One Jacobian implementation compiled twice via macros over the coordinate
 * field (fp for G1, fp2 for G2). */

#define DEFINE_GROUP(G, F, F_ADD, F_SUB, F_MUL, F_SQR, F_DBL, F_NEG, F_IS_ZERO, F_INV) \
typedef struct { F x, y, z; } G;                                               \
static inline int G##_is_inf(const G *p) { return F_IS_ZERO(&p->z); }          \
static void G##_set_inf(G *p) { memset(p, 0, sizeof(G)); }                     \
static void G##_dbl(G *o, const G *p) {                                        \
    if (G##_is_inf(p)) { *o = *p; return; }                                    \
    F a, b, c, d, e, f, t;                                                     \
    F_SQR(&a, &p->x);                                                          \
    F_SQR(&b, &p->y);                                                          \
    F_SQR(&c, &b);                                                             \
    F_ADD(&d, &p->x, &b);                                                      \
    F_SQR(&d, &d);                                                             \
    F_SUB(&d, &d, &a);                                                         \
    F_SUB(&d, &d, &c);                                                         \
    F_DBL(&d, &d);                                                             \
    F_DBL(&e, &a);                                                             \
    F_ADD(&e, &e, &a);                                                         \
    F_SQR(&f, &e);                                                             \
    F_DBL(&t, &d);                                                             \
    F_SUB(&f, &f, &t);                                                         \
    G out;                                                                     \
    out.x = f;                                                                 \
    F_SUB(&t, &d, &f);                                                         \
    F_MUL(&t, &e, &t);                                                         \
    F_DBL(&c, &c); F_DBL(&c, &c); F_DBL(&c, &c);                               \
    F_SUB(&out.y, &t, &c);                                                     \
    F_MUL(&t, &p->y, &p->z);                                                   \
    F_DBL(&out.z, &t);                                                         \
    *o = out;                                                                  \
}                                                                              \
static void G##_add(G *o, const G *p, const G *q) {                            \
    if (G##_is_inf(p)) { *o = *q; return; }                                    \
    if (G##_is_inf(q)) { *o = *p; return; }                                    \
    F z1z1, z2z2, u1, u2, s1, s2, h, i, j, rr, v, t;                           \
    F_SQR(&z1z1, &p->z);                                                       \
    F_SQR(&z2z2, &q->z);                                                       \
    F_MUL(&u1, &p->x, &z2z2);                                                  \
    F_MUL(&u2, &q->x, &z1z1);                                                  \
    F_MUL(&s1, &p->y, &q->z);                                                  \
    F_MUL(&s1, &s1, &z2z2);                                                    \
    F_MUL(&s2, &q->y, &p->z);                                                  \
    F_MUL(&s2, &s2, &z1z1);                                                    \
    F_SUB(&h, &u2, &u1);                                                       \
    F_SUB(&rr, &s2, &s1);                                                      \
    if (F_IS_ZERO(&h)) {                                                       \
        if (F_IS_ZERO(&rr)) { G##_dbl(o, p); return; }                         \
        G##_set_inf(o); return;                                                \
    }                                                                          \
    F_DBL(&rr, &rr);                                                           \
    F_DBL(&i, &h);                                                             \
    F_SQR(&i, &i);                                                             \
    F_MUL(&j, &h, &i);                                                         \
    F_MUL(&v, &u1, &i);                                                        \
    G out;                                                                     \
    F_SQR(&out.x, &rr);                                                        \
    F_SUB(&out.x, &out.x, &j);                                                 \
    F_DBL(&t, &v);                                                             \
    F_SUB(&out.x, &out.x, &t);                                                 \
    F_SUB(&t, &v, &out.x);                                                     \
    F_MUL(&t, &rr, &t);                                                        \
    F_MUL(&j, &s1, &j);                                                        \
    F_DBL(&j, &j);                                                             \
    F_SUB(&out.y, &t, &j);                                                     \
    F_ADD(&t, &p->z, &q->z);                                                   \
    F_SQR(&t, &t);                                                             \
    F_SUB(&t, &t, &z1z1);                                                      \
    F_SUB(&t, &t, &z2z2);                                                      \
    F_MUL(&out.z, &t, &h);                                                     \
    *o = out;                                                                  \
}

#define FP_ISZ(a) fp_is_zero(a)
#define FP2_ISZ(a) fp2_is_zero(a)
DEFINE_GROUP(g1p, fp, fp_add, fp_sub, fp_mul, fp_sqr, fp_dbl, fp_neg, FP_ISZ, fp_inv)
DEFINE_GROUP(g2p, fp2, fp2_add, fp2_sub, fp2_mul, fp2_sqr, fp2_dbl, fp2_neg, FP2_ISZ, fp2_inv)

/* affine <-> jacobian, canonical <-> montgomery at the ABI boundary */

static void g1_load(g1p *o, const u64 *limbs, int inf) {
    if (inf) { g1p_set_inf(o); return; }
    fp_from_canonical(&o->x, limbs);
    fp_from_canonical(&o->y, limbs + 4);
    memcpy(o->z.v, FP_ONE, 32);
}

static void g1_store(u64 *limbs, int32_t *inf, const g1p *p) {
    if (g1p_is_inf(p)) { *inf = 1; memset(limbs, 0, 64); return; }
    *inf = 0;
    fp zi, zi2, zi3, t;
    fp_inv(&zi, &p->z);
    fp_sqr(&zi2, &zi);
    fp_mul(&zi3, &zi2, &zi);
    fp_mul(&t, &p->x, &zi2);
    fp_to_canonical(limbs, &t);
    fp_mul(&t, &p->y, &zi3);
    fp_to_canonical(limbs + 4, &t);
}

static void g2_load(g2p *o, const u64 *limbs, int inf) {
    if (inf) { g2p_set_inf(o); return; }
    fp_from_canonical(&o->x.c0, limbs);
    fp_from_canonical(&o->x.c1, limbs + 4);
    fp_from_canonical(&o->y.c0, limbs + 8);
    fp_from_canonical(&o->y.c1, limbs + 12);
    memcpy(o->z.c0.v, FP_ONE, 32);
    memset(o->z.c1.v, 0, 32);
}

static void g2_store(u64 *limbs, int32_t *inf, const g2p *p) {
    if (g2p_is_inf(p)) { *inf = 1; memset(limbs, 0, 128); return; }
    *inf = 0;
    fp2 zi, zi2, zi3, t;
    fp2_inv(&zi, &p->z);
    fp2_sqr(&zi2, &zi);
    fp2_mul(&zi3, &zi2, &zi);
    fp2_mul(&t, &p->x, &zi2);
    fp_to_canonical(limbs, &t.c0);
    fp_to_canonical(limbs + 4, &t.c1);
    fp2_mul(&t, &p->y, &zi3);
    fp_to_canonical(limbs + 8, &t.c0);
    fp_to_canonical(limbs + 12, &t.c1);
}

/* ------------------------------------------------------------- Pippenger --- */

static inline int scalar_window(const uint8_t *s, int bit, int width) {
    /* width <= 16: read up to 3 bytes spanning the window */
    int byte = bit >> 3, off = bit & 7;
    uint32_t chunk = s[byte];
    if (byte + 1 < 32) chunk |= (uint32_t)s[byte + 1] << 8;
    if (byte + 2 < 32) chunk |= (uint32_t)s[byte + 2] << 16;
    return (chunk >> off) & ((1u << width) - 1);
}

#define DEFINE_MSM(G, LOAD, STORE, COORDS)                                      \
void zkm_bn254_##G##_msm(const u64 *pts, const int32_t *infs,                   \
                         const uint8_t *scalars, int64_t n,                     \
                         u64 *out, int32_t *out_inf) {                          \
    int window = n < 32 ? 4 : n < 1024 ? 8 : n < 65536 ? 12 : 14;               \
    int nbuckets = 1 << window;                                                 \
    G##p *points = malloc(sizeof(G##p) * (size_t)n);                            \
    _Pragma("omp parallel for schedule(static)")                                \
    for (int64_t i = 0; i < n; i++)                                             \
        LOAD(&points[i], pts + (size_t)i * COORDS, infs ? infs[i] : 0);         \
    int nwin = (254 + window - 1) / window;                                     \
    G##p *win_sums = malloc(sizeof(G##p) * (size_t)nwin);                       \
    _Pragma("omp parallel for schedule(dynamic)")                               \
    for (int wi = 0; wi < nwin; wi++) {                                         \
        G##p *buckets = malloc(sizeof(G##p) * (size_t)nbuckets);                \
        for (int b = 0; b < nbuckets; b++) G##p_set_inf(&buckets[b]);           \
        int start = wi * window;                                                \
        for (int64_t i = 0; i < n; i++) {                                       \
            int b = scalar_window(scalars + (size_t)i * 32, start, window);     \
            if (b) G##p_add(&buckets[b], &buckets[b], &points[i]);              \
        }                                                                       \
        G##p run, total;                                                        \
        G##p_set_inf(&run);                                                     \
        G##p_set_inf(&total);                                                   \
        for (int b = nbuckets - 1; b >= 1; b--) {                               \
            G##p_add(&run, &run, &buckets[b]);                                  \
            G##p_add(&total, &total, &run);                                     \
        }                                                                       \
        win_sums[wi] = total;                                                   \
        free(buckets);                                                          \
    }                                                                           \
    G##p acc;                                                                   \
    G##p_set_inf(&acc);                                                         \
    for (int wi = nwin - 1; wi >= 0; wi--) {                                    \
        if (wi != nwin - 1)                                                     \
            for (int k = 0; k < window; k++) G##p_dbl(&acc, &acc);              \
        G##p_add(&acc, &acc, &win_sums[wi]);                                    \
    }                                                                           \
    free(points);                                                               \
    free(win_sums);                                                             \
    STORE(out, out_inf, &acc);                                                  \
}

DEFINE_MSM(g1, g1_load, g1_store, 8)
DEFINE_MSM(g2, g2_load, g2_store, 16)

/* ------------------------------------------- fixed-base batch (key setup) ---
 * out[i] = scalar[i] * base, for n scalars, via a per-call window table.
 * Batch conversion to affine with one shared inversion chain. */

/* Batch affine normalization: one field inversion for the whole array
 * (Montgomery's trick over the prefix products of the Z coordinates). */

#define DEFINE_BATCH_STORE(G, F, COORDS, F_MUL, F_INV, TO_AFFINE)               \
static void G##_store_batch(u64 *out, int32_t *out_inf, G##p *pts, int64_t n) { \
    F *prefix = malloc(sizeof(F) * (size_t)(n + 1));                            \
    /* prefix[i] = product of non-inf z's before index i */                     \
    int64_t i;                                                                  \
    prefix[0] = FP_ONE_##G;                                                     \
    for (i = 0; i < n; i++) {                                                   \
        if (G##p_is_inf(&pts[i])) prefix[i + 1] = prefix[i];                    \
        else F_MUL(&prefix[i + 1], &prefix[i], &pts[i].z);                      \
    }                                                                           \
    F inv_all, zi;                                                              \
    F_INV(&inv_all, &prefix[n]);                                                \
    for (i = n - 1; i >= 0; i--) {                                              \
        if (G##p_is_inf(&pts[i])) { TO_AFFINE(out + (size_t)i * COORDS, out_inf + i, &pts[i], NULL); continue; } \
        F_MUL(&zi, &inv_all, &prefix[i]);       /* 1/z_i */                     \
        F_MUL(&inv_all, &inv_all, &pts[i].z);                                   \
        TO_AFFINE(out + (size_t)i * COORDS, out_inf + i, &pts[i], &zi);         \
    }                                                                           \
    free(prefix);                                                               \
}

static const fp FP_ONE_g1 = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
static const fp2 FP_ONE_g2 = {{{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}},
                              {{0, 0, 0, 0}}};

static void g1_to_affine(u64 *limbs, int32_t *inf, const g1p *p, const fp *zi) {
    if (zi == NULL) { *inf = 1; memset(limbs, 0, 64); return; }
    *inf = 0;
    fp zi2, zi3, t;
    fp_sqr(&zi2, zi);
    fp_mul(&zi3, &zi2, zi);
    fp_mul(&t, &p->x, &zi2);
    fp_to_canonical(limbs, &t);
    fp_mul(&t, &p->y, &zi3);
    fp_to_canonical(limbs + 4, &t);
}

static void g2_to_affine(u64 *limbs, int32_t *inf, const g2p *p, const fp2 *zi) {
    if (zi == NULL) { *inf = 1; memset(limbs, 0, 128); return; }
    *inf = 0;
    fp2 zi2, zi3, t;
    fp2_sqr(&zi2, zi);
    fp2_mul(&zi3, &zi2, zi);
    fp2_mul(&t, &p->x, &zi2);
    fp_to_canonical(limbs, &t.c0);
    fp_to_canonical(limbs + 4, &t.c1);
    fp2_mul(&t, &p->y, &zi3);
    fp_to_canonical(limbs + 8, &t.c0);
    fp_to_canonical(limbs + 12, &t.c1);
}

DEFINE_BATCH_STORE(g1, fp, 8, fp_mul, fp_inv, g1_to_affine)
DEFINE_BATCH_STORE(g2, fp2, 16, fp2_mul, fp2_inv, g2_to_affine)

#define DEFINE_FIXED(G, LOADGEN, COORDS)                                        \
void zkm_bn254_##G##_mul_batch(const u64 *base, int32_t base_inf,               \
                               const uint8_t *scalars, int64_t n,               \
                               u64 *out, int32_t *out_inf) {                    \
    int window = 8;                                                             \
    int nwin = (254 + window - 1) / window;                                     \
    int tsize = 1 << window;                                                    \
    G##p *table = malloc(sizeof(G##p) * (size_t)nwin * tsize);                  \
    G##p gen;                                                                   \
    LOADGEN(&gen, base, base_inf);                                              \
    for (int w = 0; w < nwin; w++) {                                            \
        G##p *row = table + (size_t)w * tsize;                                  \
        G##p_set_inf(&row[0]);                                                  \
        for (int k = 1; k < tsize; k++) G##p_add(&row[k], &row[k - 1], &gen);   \
        for (int k = 0; k < window; k++) G##p_dbl(&gen, &gen);                  \
    }                                                                           \
    G##p *accs = malloc(sizeof(G##p) * (size_t)n);                              \
    _Pragma("omp parallel for schedule(static)")                                \
    for (int64_t i = 0; i < n; i++) {                                           \
        G##p_set_inf(&accs[i]);                                                 \
        const uint8_t *s = scalars + (size_t)i * 32;                            \
        for (int w = 0; w < nwin; w++) {                                        \
            int b = scalar_window(s, w * window, window);                       \
            if (b) G##p_add(&accs[i], &accs[i], &table[(size_t)w * tsize + b]); \
        }                                                                       \
    }                                                                           \
    G##_store_batch(out, out_inf, accs, n);                                     \
    free(accs);                                                                 \
    free(table);                                                                \
}

DEFINE_FIXED(g1, g1_load, 8)
DEFINE_FIXED(g2, g2_load, 16)

/* ---- vectorized Fr ops (Montgomery domain unless noted) -----------------
 * The PLONK prover's polynomial pipeline (snark/plonk.py) runs its pointwise
 * rounds over packed (n,4) u64 arrays through these. */

void zkm_bn254_fr_vec_mont(u64 *vals, int64_t n, int32_t to) {
    fr *v = (fr *)vals;
    if (to) {
        fr r2; memcpy(r2.v, FR_R2, 32);
        for (int64_t i = 0; i < n; i++) fr_mul(&v[i], &v[i], &r2);
    } else {
        fr one = {{1, 0, 0, 0}};
        for (int64_t i = 0; i < n; i++) fr_mul(&v[i], &v[i], &one);
    }
}

void zkm_bn254_fr_vec_addsub(const u64 *a, const u64 *b, u64 *out, int64_t n, int32_t sub) {
    const fr *x = (const fr *)a, *y = (const fr *)b;
    fr *o = (fr *)out;
    if (sub) { for (int64_t i = 0; i < n; i++) fr_sub(&o[i], &x[i], &y[i]); }
    else { for (int64_t i = 0; i < n; i++) fr_add(&o[i], &x[i], &y[i]); }
}

void zkm_bn254_fr_vec_mul(const u64 *a, const u64 *b, u64 *out, int64_t n) {
    const fr *x = (const fr *)a, *y = (const fr *)b;
    fr *o = (fr *)out;
    #pragma omp parallel for schedule(static) if (n >= 8192)
    for (int64_t i = 0; i < n; i++) fr_mul(&o[i], &x[i], &y[i]);
}

/* out[i] = a[i] * k + d  (all Montgomery) */
void zkm_bn254_fr_vec_scale_add(const u64 *a, const u64 k_m[4], const u64 d_m[4],
                                u64 *out, int64_t n) {
    const fr *x = (const fr *)a;
    fr *o = (fr *)out;
    fr k, d;
    memcpy(k.v, k_m, 32);
    memcpy(d.v, d_m, 32);
    for (int64_t i = 0; i < n; i++) {
        fr t;
        fr_mul(&t, &x[i], &k);
        fr_add(&o[i], &t, &d);
    }
}

/* batch inverse (Montgomery trick); zero inputs are mapped to zero */
void zkm_bn254_fr_vec_inv(const u64 *a, u64 *out, int64_t n) {
    const fr *x = (const fr *)a;
    fr *o = (fr *)out;
    fr acc; memcpy(acc.v, FR_ONE, 32);
    /* forward: o[i] = prefix product before x[i] */
    for (int64_t i = 0; i < n; i++) {
        o[i] = acc;
        int nz = x[i].v[0] | x[i].v[1] | x[i].v[2] | x[i].v[3] ? 1 : 0;
        if (nz) fr_mul(&acc, &acc, &x[i]);
    }
    fr inv; fr_inv(&inv, &acc);
    for (int64_t i = n - 1; i >= 0; i--) {
        int nz = x[i].v[0] | x[i].v[1] | x[i].v[2] | x[i].v[3] ? 1 : 0;
        if (!nz) { memset(o[i].v, 0, 32); continue; }
        fr t;
        fr_mul(&t, &o[i], &inv);
        fr_mul(&inv, &inv, &x[i]);
        o[i] = t;
    }
}

/* out[i] = s * x^i (Montgomery) */
void zkm_bn254_fr_vec_powers(const u64 x_m[4], const u64 s_m[4], u64 *out, int64_t n) {
    fr x, acc;
    memcpy(x.v, x_m, 32);
    memcpy(acc.v, s_m, 32);
    fr *o = (fr *)out;
    for (int64_t i = 0; i < n; i++) {
        o[i] = acc;
        fr_mul(&acc, &acc, &x);
    }
}

/* out = a / (X - z) (Montgomery, synthetic division); returns 0 iff the
 * remainder is zero */
int32_t zkm_bn254_fr_vec_div_linear(const u64 *a, const u64 z_m[4], u64 *out, int64_t n) {
    const fr *p = (const fr *)a;
    fr *o = (fr *)out;
    fr z, acc;
    memcpy(z.v, z_m, 32);
    memset(acc.v, 0, 32);
    for (int64_t i = n - 1; i >= 1; i--) {
        fr_add(&acc, &acc, &p[i]);
        o[i - 1] = acc;
        fr t;
        fr_mul(&t, &acc, &z);
        acc = t;
    }
    fr_add(&acc, &acc, &p[0]);
    return (acc.v[0] | acc.v[1] | acc.v[2] | acc.v[3]) ? 1 : 0;
}

/* ---- Poseidon2 over Fr, width 3 (the outer config's Merkle hash) ---------
 * 8 external + 56 internal rounds, x^5 sbox, external matrix circ(2,1,1),
 * internal diag (1,1,2).  Round constants arrive canonical from Python
 * (ops/_poseidon2_bn254_rc.py) and are converted to Montgomery here. */

typedef struct { fr s0, s1, s2; } p2state;

static inline void p2_sbox(fr *x) {
    fr x2, x4;
    fr_mul(&x2, x, x);
    fr_mul(&x4, &x2, &x2);
    fr_mul(x, &x4, x);
}

static inline void p2_ext_mat(p2state *st) {
    fr t;
    fr_add(&t, &st->s0, &st->s1);
    fr_add(&t, &t, &st->s2);
    fr_add(&st->s0, &st->s0, &t);
    fr_add(&st->s1, &st->s1, &t);
    fr_add(&st->s2, &st->s2, &t);
}

/* rc_m: 64 rounds x 3 Montgomery constants */
static void p2_permute(p2state *st, const fr *rc_m) {
    p2_ext_mat(st);
    for (int r = 0; r < 4; r++) {
        fr_add(&st->s0, &st->s0, &rc_m[3 * r]);
        fr_add(&st->s1, &st->s1, &rc_m[3 * r + 1]);
        fr_add(&st->s2, &st->s2, &rc_m[3 * r + 2]);
        p2_sbox(&st->s0); p2_sbox(&st->s1); p2_sbox(&st->s2);
        p2_ext_mat(st);
    }
    for (int r = 0; r < 56; r++) {
        fr_add(&st->s0, &st->s0, &rc_m[3 * (4 + r)]);
        p2_sbox(&st->s0);
        fr t;
        fr_add(&t, &st->s0, &st->s1);
        fr_add(&t, &t, &st->s2);
        fr_add(&st->s0, &st->s0, &t);
        fr_add(&st->s1, &st->s1, &t);
        fr_add(&st->s2, &st->s2, &st->s2); /* diag 2 */
        fr_add(&st->s2, &st->s2, &t);
    }
    for (int r = 0; r < 4; r++) {
        fr_add(&st->s0, &st->s0, &rc_m[3 * (60 + r)]);
        fr_add(&st->s1, &st->s1, &rc_m[3 * (60 + r) + 1]);
        fr_add(&st->s2, &st->s2, &rc_m[3 * (60 + r) + 2]);
        p2_sbox(&st->s0); p2_sbox(&st->s1); p2_sbox(&st->s2);
        p2_ext_mat(st);
    }
}

static void p2_load_rc(fr *rc_m, const u64 *rc_canon) {
    fr r2; memcpy(r2.v, FR_R2, 32);
    for (int i = 0; i < 192; i++) {
        memcpy(rc_m[i].v, &rc_canon[4 * i], 32);
        fr_mul(&rc_m[i], &rc_m[i], &r2);
    }
}

/* canonical reduction of a 256-bit packed value (< ~5.8 p) */
static void fr_from_u256(fr *o, const u64 v[4]) {
    memcpy(o->v, v, 32);
    while (fr_geq_mod(o->v)) fr_sub_mod_raw(o->v);
}

/* MultiField32PaddingFreeSponge rows: each row of w canonical u32 KoalaBear
 * felts is absorbed in blocks of 16 (packed 8-per-Fr at 32-bit stride),
 * digest = state[0] (canonical out). */
void zkm_bn254_hash_felts_rows(const uint32_t *rows, int64_t h, int64_t w,
                               const u64 *rc_canon, u64 *out /* h*4 */) {
    fr rc_m[192];
    p2_load_rc(rc_m, rc_canon);
    fr one = {{1, 0, 0, 0}};
    fr r2; memcpy(r2.v, FR_R2, 32);
    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < h; i++) {
        const uint32_t *row = &rows[i * w];
        p2state st;
        memset(&st, 0, sizeof(st));
        for (int64_t b = 0; b < w; b += 16) {
            int64_t blk = w - b < 16 ? w - b : 16;
            for (int64_t c = 0; c < blk; c += 8) {
                int64_t m = blk - c < 8 ? blk - c : 8;
                u64 packed[4] = {0, 0, 0, 0};
                for (int64_t j = 0; j < m; j++) {
                    u64 v = row[b + c + j];
                    int bit = (int)(32 * j);
                    packed[bit / 64] |= v << (bit % 64);
                    if (bit % 64 == 32 && (v >> 32)) { /* v < 2^31: no carry */ }
                }
                fr slot;
                fr_from_u256(&slot, packed);
                fr_mul(&slot, &slot, &r2); /* to Montgomery */
                if (c / 8 == 0) st.s0 = slot; else st.s1 = slot;
            }
            p2_permute(&st, rc_m);
        }
        fr_mul(&st.s0, &st.s0, &one); /* from Montgomery */
        memcpy(&out[4 * i], st.s0.v, 32);
    }
}

/* TruncatedPermutation rows: digest = permute([l, r, 0])[0] */
void zkm_bn254_compress_rows(const u64 *left, const u64 *right, int64_t n,
                             const u64 *rc_canon, u64 *out) {
    fr rc_m[192];
    p2_load_rc(rc_m, rc_canon);
    fr one = {{1, 0, 0, 0}};
    fr r2; memcpy(r2.v, FR_R2, 32);
    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        p2state st;
        memcpy(st.s0.v, &left[4 * i], 32);
        memcpy(st.s1.v, &right[4 * i], 32);
        memset(st.s2.v, 0, 32);
        fr_mul(&st.s0, &st.s0, &r2);
        fr_mul(&st.s1, &st.s1, &r2);
        p2_permute(&st, rc_m);
        fr_mul(&st.s0, &st.s0, &one);
        memcpy(&out[4 * i], st.s0.v, 32);
    }
}
