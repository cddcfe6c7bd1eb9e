/* Batched Poseidon2-16 permutation over KoalaBear, Montgomery domain.
 *
 * Host-side hot loop for Merkle commits and recursion trace hashing: the
 * numpy lane-vectorized permute (ops/poseidon2.py:_permute_np) makes ~40
 * full passes over the batch with temporaries; this kernel fuses the whole
 * 24-round permutation over SoA blocks that live in L1, letting gcc
 * auto-vectorize the lane loops (reference analog: the C++ row encoders +
 * kb31_t.hpp Montgomery arithmetic, crates/core/machine/include/kb31_t.hpp).
 *
 * Layout contract with zkmips_tpu/ops/poseidon2.py:
 *   - state rows are (n, 16) uint32 C-order, values in Montgomery form
 *   - round structure: external linear, 4 ext rounds (RC rows 0..3),
 *     13 internal rounds (RC rows 4..16 col 0), 4 ext rounds (RC rows 17..20)
 */

#include <stdint.h>
#include <string.h>

typedef uint32_t u32;
typedef uint64_t u64;

#define P 0x7f000001u
#define MU 0x81000001u /* P^{-1} mod 2^32 */
#define W 16
#define B 64 /* SoA block: 16*64*4 = 4 KiB, fits L1 with temporaries */

static u32 RCF[4][W], RCI[13], RCS[4][W], DIAG[W];

void zkm_p2b_set_constants(const u32 *rc_30x16_monty, const u32 *diag_monty) {
  for (int r = 0; r < 4; r++)
    memcpy(RCF[r], rc_30x16_monty + 16 * r, 64);
  for (int r = 0; r < 13; r++)
    RCI[r] = rc_30x16_monty[16 * (4 + r)];
  for (int r = 0; r < 4; r++)
    memcpy(RCS[r], rc_30x16_monty + 16 * (17 + r), 64);
  memcpy(DIAG, diag_monty, 64);
}

static inline u32 mmul(u32 a, u32 b) {
  u64 t = (u64)a * b;
  u32 m = (u32)t * MU;
  u64 u = (u64)m * P;
  u32 hi = (u32)(t >> 32), uh = (u32)(u >> 32);
  u32 r = hi - uh;
  return hi < uh ? r + P : r;
}

static inline u32 addp(u32 a, u32 b) {
  u32 r = a + b;
  return r >= P ? r - P : r;
}

/* one SoA block: s[lane][j] */
static void block_permute(u32 s[W][B], int nb) {
  u32 t[W][B];

#define EXT_LINEAR()                                                           \
  do {                                                                         \
    for (int g = 0; g < 16; g += 4) {                                          \
      for (int j = 0; j < nb; j++) {                                           \
        u32 s0 = s[g][j], s1 = s[g + 1][j], s2 = s[g + 2][j], s3 = s[g + 3][j];\
        u32 t01 = addp(s0, s1), t23 = addp(s2, s3);                            \
        u32 t0123 = addp(t01, t23);                                            \
        u32 t01123 = addp(t0123, s1), t01233 = addp(t0123, s3);                \
        t[g + 3][j] = addp(t01233, addp(s0, s0));                              \
        t[g + 1][j] = addp(t01123, addp(s2, s2));                              \
        t[g][j] = addp(t01123, t01);                                           \
        t[g + 2][j] = addp(t01233, t23);                                       \
      }                                                                        \
    }                                                                          \
    for (int k = 0; k < 4; k++) {                                              \
      for (int j = 0; j < nb; j++) {                                           \
        u32 sum = addp(addp(t[k][j], t[4 + k][j]), addp(t[8 + k][j], t[12 + k][j])); \
        s[k][j] = addp(t[k][j], sum);                                          \
        s[4 + k][j] = addp(t[4 + k][j], sum);                                  \
        s[8 + k][j] = addp(t[8 + k][j], sum);                                  \
        s[12 + k][j] = addp(t[12 + k][j], sum);                                \
      }                                                                        \
    }                                                                          \
  } while (0)

  EXT_LINEAR();
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < W; i++) {
      u32 rc = RCF[r][i];
      for (int j = 0; j < nb; j++) {
        u32 x = addp(s[i][j], rc);
        s[i][j] = mmul(mmul(x, x), x);
      }
    }
    EXT_LINEAR();
  }
  for (int r = 0; r < 13; r++) {
    u32 rc = RCI[r];
    for (int j = 0; j < nb; j++) {
      u32 x = addp(s[0][j], rc);
      s[0][j] = mmul(mmul(x, x), x);
    }
    u32 total[B];
    for (int j = 0; j < nb; j++)
      total[j] = addp(addp(addp(s[0][j], s[1][j]), addp(s[2][j], s[3][j])),
                      addp(addp(s[4][j], s[5][j]), addp(s[6][j], s[7][j])));
    for (int j = 0; j < nb; j++)
      total[j] = addp(total[j],
                      addp(addp(addp(s[8][j], s[9][j]), addp(s[10][j], s[11][j])),
                           addp(addp(s[12][j], s[13][j]), addp(s[14][j], s[15][j]))));
    for (int i = 0; i < W; i++) {
      u32 d = DIAG[i];
      for (int j = 0; j < nb; j++)
        s[i][j] = addp(mmul(s[i][j], d), total[j]);
    }
  }
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < W; i++) {
      u32 rc = RCS[r][i];
      for (int j = 0; j < nb; j++) {
        u32 x = addp(s[i][j], rc);
        s[i][j] = mmul(mmul(x, x), x);
      }
    }
    EXT_LINEAR();
  }
#undef EXT_LINEAR
}

/* rows: (n, 16) uint32 AoS, permuted in place */
void zkm_p2b_permute_rows(u32 *rows, u64 n) {
  u32 s[W][B];
  for (u64 base = 0; base < n; base += B) {
    int nb = (int)(n - base < B ? n - base : B);
    for (int j = 0; j < nb; j++)
      for (int i = 0; i < W; i++)
        s[i][j] = rows[(base + j) * W + i];
    block_permute(s, nb);
    for (int j = 0; j < nb; j++)
      for (int i = 0; i < W; i++)
        rows[(base + j) * W + i] = s[i][j];
  }
}

/* 2-to-1 digest compression for Merkle levels: left/right (n,8) -> out (n,8).
 * Sponge state = [left || right], one permutation, take first 8 lanes
 * (must match ops/merkle.py's compression exactly). */
void zkm_p2b_compress_rows(const u32 *left, const u32 *right, u32 *out, u64 n) {
  u32 s[W][B];
  for (u64 base = 0; base < n; base += B) {
    int nb = (int)(n - base < B ? n - base : B);
    for (int j = 0; j < nb; j++) {
      for (int i = 0; i < 8; i++) {
        s[i][j] = left[(base + j) * 8 + i];
        s[8 + i][j] = right[(base + j) * 8 + i];
      }
    }
    block_permute(s, nb);
    for (int j = 0; j < nb; j++)
      for (int i = 0; i < 8; i++)
        out[(base + j) * 8 + i] = s[i][j];
  }
}

/* Full PaddingFreeSponge<16,8,8> over rows of an (n, w) matrix -> (n, 8)
 * digests, fused per SoA block (ops/poseidon2.py:hash_matrix_rows). */
void zkm_p2b_hash_rows(const u32 *mat, u64 n, u64 w, u32 *out) {
  u32 s[W][B];
  for (u64 base = 0; base < n; base += B) {
    int nb = (int)(n - base < B ? n - base : B);
    memset(s, 0, sizeof(s));
    for (u64 start = 0; start < w; start += 8) {
      int chunk = (int)(w - start < 8 ? w - start : 8);
      for (int j = 0; j < nb; j++) {
        const u32 *row = mat + (base + j) * w + start;
        for (int i = 0; i < chunk; i++)
          s[i][j] = row[i];
      }
      block_permute(s, nb);
    }
    for (int j = 0; j < nb; j++)
      for (int i = 0; i < 8; i++)
        out[(base + j) * 8 + i] = s[i][j];
  }
}
