/* Native recursion-VM interpreter (the C++ runtime kernels analog,
 * reference crates/recursion/core/src/runtime/mod.rs + sys.rs).
 *
 * Executes an encoded straight-line RecursionProgram over a flat write-once
 * 4-cell-block memory, entirely in canonical KoalaBear arithmetic (p =
 * 0x7F000001; products fit u64).  The Python side (recursion/
 * native_runtime.py) encodes instructions into a u32 stream, calls
 * zkm_rec_run once, and reconstructs the chip event record from the final
 * memory image — every operand is an address into write-once memory, so the
 * record is a pure function of (program, memory).  The only values not in
 * memory are BatchFRI's per-step running accumulators, which are exported
 * via batch_acc_out.
 *
 * Opcode stream layout (u32 words):
 *   0 MemConst   addr v0 v1 v2 v3
 *   1 Hint       addr
 *   2 BaseAlu    op out in1 in2      (op: 0 add 1 sub 2 mul 3 div 4 assert)
 *   3 ExtAlu     op out in1 in2
 *   4 Poseidon2  in[16] out[16]
 *   5 Select     bit in1 in2 out1 out2
 *   6 ExpRevBits out base n bits[n]
 *   7 HintBits   value n outs[n]
 *   8 HintExt2F  value outs[4]
 *   9 FriFold    x z alpha n (mat psz apin roin apout roout)[n]
 *  10 BatchFRI   acc n (p_at_x p_at_z alpha_pow)[n]
 *  11 CommitPV   addrs[8]
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint32_t u32;
typedef uint64_t u64;

#define P 0x7F000001u

static inline u32 addp(u32 a, u32 b) { u64 s = (u64)a + b; return s >= P ? (u32)(s - P) : (u32)s; }
static inline u32 subp(u32 a, u32 b) { return a >= b ? a - b : (u32)((u64)a + P - b); }
static inline u32 mulp(u32 a, u32 b) { return (u32)((u64)a * b % P); }

static u32 powp(u32 a, u64 e) {
  u64 r = 1, b = a % P;
  while (e) {
    if (e & 1) r = r * b % P;
    b = b * b % P;
    e >>= 1;
  }
  return (u32)r;
}

static inline u32 invp(u32 a) { return powp(a, P - 2); }

/* quartic extension X^4 = 3 (runtime.py _ext_mul_int) */
static void ext_mul(const u32 *a, const u32 *b, u32 *o) {
  u64 c[7] = {0};
  for (int i = 0; i < 4; i++)
    if (a[i])
      for (int j = 0; j < 4; j++) c[i + j] += (u64)a[i] * b[j] % P;
  o[0] = (u32)((c[0] + 3 * c[4]) % P);
  o[1] = (u32)((c[1] + 3 * c[5]) % P);
  o[2] = (u32)((c[2] + 3 * c[6]) % P);
  o[3] = (u32)(c[3] % P);
}

static u32 FROB_U; /* 3^((p-1)/4) */

static void ext_inv(const u32 *a, u32 *o) {
  u32 conj[3][4], prod[4], tmp[4], norm[4];
  for (int k = 1; k <= 3; k++)
    for (int i = 0; i < 4; i++)
      conj[k - 1][i] = mulp(a[i], powp(FROB_U, (u64)i * k));
  ext_mul(conj[0], conj[1], prod);
  ext_mul(prod, conj[2], tmp);
  ext_mul(a, tmp, norm);
  u32 ninv = invp(norm[0]);
  for (int i = 0; i < 4; i++) o[i] = mulp(tmp[i], ninv);
}

/* ---------------- Poseidon2-16 (canonical domain) ---------------- */

static u32 RC_EXT1[4][16], RC_INT[13], RC_EXT2[4][16], DIAG[16];

static inline u32 sbox(u32 x) { return mulp(mulp(x, x), x); }

static void ext_linear(u32 *s) {
  u32 o[16];
  for (int g = 0; g < 16; g += 4) {
    u64 s0 = s[g], s1 = s[g + 1], s2 = s[g + 2], s3 = s[g + 3];
    u64 t01 = s0 + s1, t23 = s2 + s3, t0123 = t01 + t23;
    u64 t01123 = t0123 + s1, t01233 = t0123 + s3;
    o[g + 3] = (u32)((t01233 + 2 * s0) % P);
    o[g + 1] = (u32)((t01123 + 2 * s2) % P);
    o[g] = (u32)((t01123 + t01) % P);
    o[g + 2] = (u32)((t01233 + t23) % P);
  }
  u32 sums[4];
  for (int k = 0; k < 4; k++)
    sums[k] = addp(addp(o[k], o[4 + k]), addp(o[8 + k], o[12 + k]));
  for (int j = 0; j < 16; j++) s[j] = addp(o[j], sums[j & 3]);
}

static void poseidon2(u32 *s) {
  ext_linear(s);
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = sbox(addp(s[i], RC_EXT1[r][i]));
    ext_linear(s);
  }
  for (int r = 0; r < 13; r++) {
    s[0] = sbox(addp(s[0], RC_INT[r]));
    u32 total = 0;
    for (int i = 0; i < 16; i++) total = addp(total, s[i]);
    for (int i = 0; i < 16; i++) s[i] = addp(mulp(s[i], DIAG[i]), total);
  }
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = sbox(addp(s[i], RC_EXT2[r][i]));
    ext_linear(s);
  }
}

void zkm_rec_set_constants(const u32 *rc_ext1, const u32 *rc_int,
                           const u32 *rc_ext2, const u32 *diag) {
  memcpy(RC_EXT1, rc_ext1, sizeof(RC_EXT1));
  memcpy(RC_INT, rc_int, sizeof(RC_INT));
  memcpy(RC_EXT2, rc_ext2, sizeof(RC_EXT2));
  memcpy(DIAG, diag, sizeof(DIAG));
  FROB_U = powp(3, (P - 1) / 4);
}

/* batched in-place permutation over (n, 16) canonical states — the host
 * Merkle/commit hashing fast path (ops/poseidon2.py hooks in here) */
void zkm_p2_permute_many(u32 *states, u64 n) {
  for (u64 i = 0; i < n; i++) poseidon2(&states[i * 16]);
}

/* returns 0 ok; 1 assert failure; 2 bad opcode; 3 witness underrun.
 * err_out[0] = failing instruction index. */
int zkm_rec_run(const u32 *code, u64 code_len, u64 mem_blocks,
                const u32 *witness, u64 n_witness,
                u32 *mem /* mem_blocks*4, zeroed by caller */,
                u32 *batch_acc /* batch_total*4 */, u64 *err_out) {
  u64 ip = 0, wptr = 0, insn = 0, bacc_n = 0;
  while (ip < code_len) {
    u32 op = code[ip++];
    switch (op) {
      case 0: { /* MemConst */
        u32 a = code[ip];
        memcpy(&mem[(u64)a * 4], &code[ip + 1], 16);
        ip += 5;
        break;
      }
      case 1: { /* Hint */
        if (wptr >= n_witness) { err_out[0] = insn; return 3; }
        u32 a = code[ip++];
        memcpy(&mem[(u64)a * 4], &witness[wptr * 4], 16);
        wptr++;
        break;
      }
      case 2: { /* BaseAlu */
        u32 o = code[ip], out = code[ip + 1], i1 = code[ip + 2], i2 = code[ip + 3];
        ip += 4;
        u32 a = mem[(u64)i1 * 4], b = mem[(u64)i2 * 4];
        if (o == 4) {
          if (a != b) { err_out[0] = insn; return 1; }
          break;
        }
        u32 r = o == 0 ? addp(a, b) : o == 1 ? subp(a, b)
                : o == 2 ? mulp(a, b) : mulp(a, invp(b));
        mem[(u64)out * 4] = r;
        break;
      }
      case 3: { /* ExtAlu */
        u32 o = code[ip], out = code[ip + 1], i1 = code[ip + 2], i2 = code[ip + 3];
        ip += 4;
        const u32 *a = &mem[(u64)i1 * 4], *b = &mem[(u64)i2 * 4];
        u32 *dst = &mem[(u64)out * 4];
        if (o == 4) {
          if (memcmp(a, b, 16)) { err_out[0] = insn; return 1; }
          break;
        }
        if (o == 0) { for (int i = 0; i < 4; i++) dst[i] = addp(a[i], b[i]); }
        else if (o == 1) { for (int i = 0; i < 4; i++) dst[i] = subp(a[i], b[i]); }
        else if (o == 2) ext_mul(a, b, dst);
        else { u32 bi[4]; ext_inv(b, bi); ext_mul(a, bi, dst); }
        break;
      }
      case 4: { /* Poseidon2 */
        u32 s[16];
        for (int i = 0; i < 16; i++) s[i] = mem[(u64)code[ip + i] * 4];
        poseidon2(s);
        for (int i = 0; i < 16; i++) mem[(u64)code[ip + 16 + i] * 4] = s[i];
        ip += 32;
        break;
      }
      case 5: { /* Select */
        u32 bit = mem[(u64)code[ip] * 4];
        const u32 *a = &mem[(u64)code[ip + 1] * 4], *b = &mem[(u64)code[ip + 2] * 4];
        u32 *o1 = &mem[(u64)code[ip + 3] * 4], *o2 = &mem[(u64)code[ip + 4] * 4];
        memcpy(o1, bit ? b : a, 16);
        memcpy(o2, bit ? a : b, 16);
        ip += 5;
        break;
      }
      case 6: { /* ExpReverseBitsLen */
        u32 out = code[ip], base = mem[(u64)code[ip + 1] * 4], n = code[ip + 2];
        u64 e = 0;
        for (u32 k = 0; k < n; k++) e = e * 2 + mem[(u64)code[ip + 3 + k] * 4];
        mem[(u64)out * 4] = powp(base, e);
        ip += 3 + n;
        break;
      }
      case 7: { /* HintBits */
        u32 v = mem[(u64)code[ip] * 4], n = code[ip + 1];
        for (u32 k = 0; k < n; k++) mem[(u64)code[ip + 2 + k] * 4] = (v >> k) & 1;
        ip += 2 + n;
        break;
      }
      case 8: { /* HintExt2Felts */
        const u32 *blk = &mem[(u64)code[ip] * 4];
        for (int k = 0; k < 4; k++) mem[(u64)code[ip + 1 + k] * 4] = blk[k];
        ip += 5;
        break;
      }
      case 9: { /* FriFold */
        u32 x = mem[(u64)code[ip] * 4];
        const u32 *z = &mem[(u64)code[ip + 1] * 4];
        const u32 *alpha = &mem[(u64)code[ip + 2] * 4];
        u32 n = code[ip + 3];
        u32 xz[4] = {subp(x, z[0]), subp(0, z[1]), subp(0, z[2]), subp(0, z[3])};
        u32 ixz[4];
        ext_inv(xz, ixz);
        const u32 *c = &code[ip + 4];
        for (u32 m = 0; m < n; m++, c += 6) {
          const u32 *px = &mem[(u64)c[0] * 4], *pz = &mem[(u64)c[1] * 4];
          const u32 *ap = &mem[(u64)c[2] * 4], *ro = &mem[(u64)c[3] * 4];
          u32 diff[4], q[4], t[4];
          for (int i = 0; i < 4; i++) diff[i] = subp(px[i], pz[i]);
          ext_mul(diff, ixz, q);
          ext_mul(ap, q, t);
          u32 *rout = &mem[(u64)c[5] * 4], *apout = &mem[(u64)c[4] * 4];
          for (int i = 0; i < 4; i++) rout[i] = addp(ro[i], t[i]);
          ext_mul(ap, alpha, apout);
        }
        ip += 4 + 6 * n;
        break;
      }
      case 10: { /* BatchFRI */
        u32 accaddr = code[ip], n = code[ip + 1];
        u32 acc[4] = {0, 0, 0, 0};
        const u32 *c = &code[ip + 2];
        for (u32 m = 0; m < n; m++, c += 3) {
          u32 px = mem[(u64)c[0] * 4];
          const u32 *pz = &mem[(u64)c[1] * 4], *ap = &mem[(u64)c[2] * 4];
          u32 diff[4] = {subp(pz[0], px), pz[1], pz[2], pz[3]};
          u32 t[4];
          ext_mul(ap, diff, t);
          for (int i = 0; i < 4; i++) acc[i] = addp(acc[i], t[i]);
          memcpy(&batch_acc[bacc_n * 4], acc, 16);
          bacc_n++;
        }
        memcpy(&mem[(u64)accaddr * 4], acc, 16);
        ip += 2 + 3 * n;
        break;
      }
      case 11: { /* CommitPublicValues: addresses only, read back by host */
        u32 n = code[ip++];
        ip += n;
        break;
      }
      default:
        err_out[0] = insn;
        return 2;
    }
    insn++;
  }
  err_out[0] = insn;
  return 0;
}
