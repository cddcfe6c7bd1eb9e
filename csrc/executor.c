/* MIPS32r2 simple-mode interpreter: the native fast path for execute().
 *
 * The analog of the reference's hot emulator loop (crates/core/executor/src/
 * executor.rs execute_cycle/execute_operation), trace-free: no events, just
 * architectural state + cycle counting + the io/syscall side effects needed
 * by `ProverClient.execute` and shard planning.  Instructions arrive
 * predecoded from Python (the Python decoder is the single source of truth);
 * unsupported syscalls abort with a sentinel so the caller can fall back to
 * the Python interpreter.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define PAGE_BITS 14u /* 16 KiB pages, word-addressed inside */
#define PAGE_WORDS (1u << (PAGE_BITS - 2u))
#define NUM_PAGES (1u << (31u - PAGE_BITS))
#define MASK32 0xFFFFFFFFu

enum {
  OP_ADD = 0, OP_SUB = 1, OP_MUL = 2, OP_MULT = 3, OP_MULTU = 4,
  OP_DIV = 5, OP_DIVU = 6, OP_MOD = 7, OP_MODU = 8, OP_SLL = 9,
  OP_SRL = 10, OP_SRA = 11, OP_ROR = 12, OP_SLT = 13, OP_SLTU = 14,
  OP_AND = 15, OP_OR = 16, OP_XOR = 17, OP_NOR = 18, OP_CLZ = 19,
  OP_CLO = 20, OP_BEQ = 21, OP_BGEZ = 22, OP_BGTZ = 23, OP_BLEZ = 24,
  OP_BLTZ = 25, OP_BNE = 26, OP_JUMP = 27, OP_JUMPI = 28, OP_JUMPDIRECT = 29,
  OP_SYSCALL = 30, OP_LB = 31, OP_LBU = 32, OP_LH = 33, OP_LHU = 34,
  OP_LW = 35, OP_LWL = 36, OP_LWR = 37, OP_LL = 38, OP_SB = 39, OP_SH = 40,
  OP_SW = 41, OP_SWL = 42, OP_SWR = 43, OP_SC = 44, OP_INS = 45,
  OP_MADDU = 46, OP_MSUBU = 47, OP_MADD = 48, OP_MSUB = 49, OP_MEQ = 50,
  OP_MNE = 51, OP_WSBH = 52, OP_EXT = 53, OP_TEQ = 54, OP_SEXT = 55,
  OP_UNIMPL = 255,
};

enum {
  EXIT_OK = 0,
  EXIT_MAX_CYCLES = 1,
  EXIT_UNSUPPORTED_SYSCALL = 2,
  EXIT_TRAP = 3,
  EXIT_BAD_MEMORY = 4,
  EXIT_UNIMPL = 5,
};

typedef struct {
  uint8_t opcode;
  uint8_t op_a;
  uint8_t imm_b;
  uint8_t imm_c;
  uint32_t op_b;
  uint32_t op_c;
} Insn;

typedef struct {
  uint32_t **pages;
  uint32_t regs[36];
  uint32_t pc, next_pc;
  uint64_t clk;           /* shard-relative clock (x5 per cycle) */
  uint64_t global_clk;    /* instruction count */
  uint32_t exited;
  uint32_t exit_code;
  /* io */
  const uint8_t *const *hints;
  const uint64_t *hint_lens;
  uint32_t num_hints;
  uint32_t hint_ptr;
  uint32_t digest[8];
  uint8_t *pv_stream;
  uint64_t pv_len, pv_cap;
  uint8_t *stdout_buf;
  uint64_t so_len, so_cap;
} Machine;

static uint32_t *page_for(Machine *m, uint32_t addr) {
  uint32_t p = addr >> PAGE_BITS;
  if (!m->pages[p]) {
    m->pages[p] = (uint32_t *)calloc(PAGE_WORDS, 4);
  }
  return m->pages[p];
}

static inline uint32_t mem_rd(Machine *m, uint32_t addr) {
  uint32_t *pg = m->pages[addr >> PAGE_BITS];
  if (!pg) return 0;
  return pg[(addr & ((1u << PAGE_BITS) - 1u)) >> 2];
}

static inline void mem_wr(Machine *m, uint32_t addr, uint32_t v) {
  uint32_t *pg = page_for(m, addr);
  pg[(addr & ((1u << PAGE_BITS) - 1u)) >> 2] = v;
}

static inline uint8_t mem_byte(Machine *m, uint32_t addr) {
  return (uint8_t)(mem_rd(m, addr & ~3u) >> ((addr & 3u) * 8u));
}

static inline uint32_t ror32(uint32_t x, uint32_t r) {
  r &= 31u;
  return r ? ((x >> r) | (x << (32u - r))) : x;
}

static int do_syscall(Machine *m) {
  uint32_t id = m->regs[2];  /* $v0 */
  uint32_t a0 = m->regs[4], a1 = m->regs[5], a2 = m->regs[6];
  switch (id) {
    case 0x00000000: /* HALT */
      if (a0 != 0) return EXIT_TRAP;
      m->exited = 1;
      m->exit_code = a0;
      m->next_pc = 0;
      return EXIT_OK;
    case 0x00000002: { /* WRITE: fd 3 (public values) kept; hook/hint fds (>=4)
                          need host callbacks -> punt to the reference path */
      if (a0 >= 4) return EXIT_UNSUPPORTED_SYSCALL;
      if (a0 == 1 || a0 == 2) {
        if (m->so_len + a2 > m->so_cap) {
          while (m->so_len + a2 > m->so_cap) m->so_cap *= 2;
          m->stdout_buf = (uint8_t *)realloc(m->stdout_buf, m->so_cap);
        }
        for (uint32_t i = 0; i < a2; i++) m->stdout_buf[m->so_len++] = mem_byte(m, a1 + i);
      }
      if (a0 == 3) {
        if (m->pv_len + a2 > m->pv_cap) {
          while (m->pv_len + a2 > m->pv_cap) m->pv_cap *= 2;
          m->pv_stream = (uint8_t *)realloc(m->pv_stream, m->pv_cap);
        }
        for (uint32_t i = 0; i < a2; i++) m->pv_stream[m->pv_len++] = mem_byte(m, a1 + i);
      }
      return EXIT_OK;
    }
    case 0x00000010: /* COMMIT */
      if (a0 >= 8) return EXIT_TRAP;
      m->digest[a0] = a1;
      return EXIT_OK;
    case 0x000000F0: /* SYSHINTLEN */
      if (m->hint_ptr >= m->num_hints) return EXIT_TRAP;
      m->regs[2] = (uint32_t)m->hint_lens[m->hint_ptr];
      return -1; /* result already written */
    case 0x000000F1: { /* SYSHINTREAD */
      if (m->hint_ptr >= m->num_hints) return EXIT_TRAP;
      const uint8_t *buf = m->hints[m->hint_ptr];
      uint64_t len = m->hint_lens[m->hint_ptr];
      m->hint_ptr++;
      if (len != a1 || (a0 & 3u)) return EXIT_TRAP;
      for (uint64_t i = 0; i < len; i += 4) {
        uint32_t w = 0;
        for (int j = 0; j < 4 && i + (uint64_t)j < len; j++) w |= ((uint32_t)buf[i + j]) << (8 * j);
        mem_wr(m, a0 + (uint32_t)i, w);
      }
      return EXIT_OK;
    }
    case 0x30010005: { /* SHA_EXTEND */
      uint32_t w[64];
      for (int i = 0; i < 64; i++) w[i] = mem_rd(m, a0 + 4u * (uint32_t)i);
      for (int i = 16; i < 64; i++) {
        uint32_t s0 = ror32(w[i - 15], 7) ^ ror32(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = ror32(w[i - 2], 17) ^ ror32(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = s1 + w[i - 16] + s0 + w[i - 7];
        mem_wr(m, a0 + 4u * (uint32_t)i, w[i]);
      }
      m->clk += 48;
      return EXIT_OK;
    }
    case 0x01010006: { /* SHA_COMPRESS */
      static const uint32_t K[64] = {
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
        0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
        0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
        0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
        0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
        0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208, 0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
      };
      uint32_t h[8];
      for (int i = 0; i < 8; i++) h[i] = mem_rd(m, a1 + 4u * (uint32_t)i);
      uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5], g = h[6], hh = h[7];
      for (int i = 0; i < 64; i++) {
        uint32_t wi = mem_rd(m, a0 + 4u * (uint32_t)i);
        uint32_t s1 = ror32(e, 6) ^ ror32(e, 11) ^ ror32(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = hh + s1 + ch + K[i] + wi;
        uint32_t s0 = ror32(a, 2) ^ ror32(a, 13) ^ ror32(a, 22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = s0 + maj;
        hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
      }
      uint32_t v[8] = {a, b, c, d, e, f, g, hh};
      for (int i = 0; i < 8; i++) mem_wr(m, a1 + 4u * (uint32_t)i, h[i] + v[i]);
      m->clk += 1;
      return EXIT_OK;
    }
    case 0x01010009: { /* KECCAK_SPONGE */
      static const uint64_t RC[24] = {
        0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL, 0x8000000080008000ULL,
        0x000000000000808BULL, 0x0000000080000001ULL, 0x8000000080008081ULL, 0x8000000000008009ULL,
        0x000000000000008AULL, 0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
        0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL, 0x8000000000008003ULL,
        0x8000000000008002ULL, 0x8000000000000080ULL, 0x000000000000800AULL, 0x800000008000000AULL,
        0x8000000080008081ULL, 0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
      };
      static const int ROT[5][5] = {
        {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
        {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14},
      };
      uint32_t input_len = mem_rd(m, a1 + 16u * 4u);
      if (input_len % 36u != 0) return EXIT_TRAP;
      uint64_t st[25] = {0};
      for (uint32_t off = 0; off < input_len; off += 36u) {
        for (int i = 0; i < 18; i++) {
          uint64_t lo = mem_rd(m, a0 + 4u * (off + 2u * (uint32_t)i));
          uint64_t hi = mem_rd(m, a0 + 4u * (off + 2u * (uint32_t)i + 1u));
          st[i] ^= lo | (hi << 32);
        }
        for (int r = 0; r < 24; r++) {
          uint64_t c[5], d[5], bm[25];
          for (int x = 0; x < 5; x++)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
          for (int x = 0; x < 5; x++) {
            uint64_t t = c[(x + 1) % 5];
            d[x] = c[(x + 4) % 5] ^ ((t << 1) | (t >> 63));
          }
          for (int i = 0; i < 25; i++) st[i] ^= d[i % 5];
          for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) {
              int rr = ROT[x][y];
              uint64_t v = st[x + 5 * y];
              bm[y + 5 * ((2 * x + 3 * y) % 5)] = rr ? ((v << rr) | (v >> (64 - rr))) : v;
            }
          for (int i = 0; i < 25; i++) {
            int row = 5 * (i / 5);
            st[i] = bm[i] ^ (~bm[(i % 5 + 1) % 5 + row] & bm[(i % 5 + 2) % 5 + row]);
          }
          st[0] ^= RC[r];
        }
      }
      for (int i = 0; i < 8; i++) {
        mem_wr(m, a1 + 8u * (uint32_t)i, (uint32_t)(st[i] & 0xFFFFFFFFULL));
        mem_wr(m, a1 + 8u * (uint32_t)i + 4u, (uint32_t)(st[i] >> 32));
      }
      m->clk += 1;
      return EXIT_OK;
    }
    default:
      return EXIT_UNSUPPORTED_SYSCALL;
  }
}

static int free_and(Machine *m, uint32_t *out_regs, uint32_t *out_digest,
                    uint64_t *out_counts, uint8_t **out_pv, uint8_t **out_stdout, int status);

int zkm_run(
    const Insn *insns, uint32_t num_insns, uint32_t pc_base, uint32_t pc_start,
    const uint32_t *image_addrs, const uint32_t *image_vals, uint32_t image_len,
    const uint8_t *const *hints, const uint64_t *hint_lens, uint32_t num_hints,
    uint64_t max_cycles,
    /* outputs */
    uint32_t *out_regs /*36*/, uint32_t *out_digest /*8*/,
    uint64_t *out_counts /*global_clk, clk, exit_code, pv_len, stdout_len*/,
    uint8_t **out_pv /* malloc'd; caller frees via zkm_free */,
    uint8_t **out_stdout /* malloc'd; caller frees via zkm_free */) {
  Machine m;
  memset(&m, 0, sizeof(m));
  m.pages = (uint32_t **)calloc(NUM_PAGES, sizeof(uint32_t *));
  m.pc = pc_start;
  m.next_pc = pc_start + 4;
  m.hints = hints;
  m.hint_lens = hint_lens;
  m.num_hints = num_hints;
  m.pv_cap = 1024;
  m.pv_stream = (uint8_t *)malloc(m.pv_cap);
  m.so_cap = 1024;
  m.so_len = 0;
  m.stdout_buf = (uint8_t *)malloc(m.so_cap);

  for (uint32_t i = 0; i < image_len; i++) {
    uint32_t a = image_addrs[i];
    if (a < 36u) m.regs[a] = image_vals[i];
    else mem_wr(&m, a, image_vals[i]);
  }

  int status = EXIT_OK;
  while (!m.exited && m.pc != 0) {
    if (m.global_clk >= max_cycles) { status = EXIT_MAX_CYCLES; break; }
    uint32_t idx = (m.pc - pc_base) >> 2;
    if (idx >= num_insns) { status = EXIT_BAD_MEMORY; break; }
    const Insn *in = &insns[idx];
    uint32_t next_pc = m.next_pc, next_next_pc = m.next_pc + 4;
    uint32_t a, b, c;
    uint8_t op = in->opcode;

    switch (op) {
      case OP_ADD: case OP_SUB: case OP_MUL: case OP_MULT: case OP_MULTU:
      case OP_DIV: case OP_DIVU: case OP_MOD: case OP_MODU: case OP_SLL:
      case OP_SRL: case OP_SRA: case OP_ROR: case OP_SLT: case OP_SLTU:
      case OP_AND: case OP_OR: case OP_XOR: case OP_NOR: case OP_CLZ: case OP_CLO: {
        b = in->imm_b ? in->op_b : m.regs[in->op_b];
        c = in->imm_c ? in->op_c : m.regs[in->op_c];
        uint32_t hi = 0, write_hi = 0;
        switch (op) {
          case OP_ADD: a = b + c; break;
          case OP_SUB: a = b - c; break;
          case OP_MUL: a = b * c; break;
          case OP_MULT: { int64_t o = (int64_t)(int32_t)b * (int32_t)c; a = (uint32_t)o; hi = (uint32_t)((uint64_t)o >> 32); write_hi = 1; break; }
          case OP_MULTU: { uint64_t o = (uint64_t)b * c; a = (uint32_t)o; hi = (uint32_t)(o >> 32); write_hi = 1; break; }
          case OP_DIV: if (!c) return free_and(&m, out_regs, out_digest, out_counts, out_pv, out_stdout, EXIT_TRAP); a = (uint32_t)((int32_t)b / (int32_t)c); hi = (uint32_t)((int32_t)b % (int32_t)c); write_hi = 1; break;
          case OP_DIVU: if (!c) return free_and(&m, out_regs, out_digest, out_counts, out_pv, out_stdout, EXIT_TRAP); a = b / c; hi = b % c; write_hi = 1; break;
          case OP_MOD: if (!c) return free_and(&m, out_regs, out_digest, out_counts, out_pv, out_stdout, EXIT_TRAP); a = (uint32_t)((int32_t)b % (int32_t)c); break;
          case OP_MODU: if (!c) return free_and(&m, out_regs, out_digest, out_counts, out_pv, out_stdout, EXIT_TRAP); a = b % c; break;
          case OP_SLL: a = b << (c & 31); break;
          case OP_SRL: a = b >> (c & 31); break;
          case OP_SRA: a = (uint32_t)((int32_t)b >> (c & 31)); break;
          case OP_ROR: a = ror32(b, c); break;
          case OP_SLT: a = (int32_t)b < (int32_t)c; break;
          case OP_SLTU: a = b < c; break;
          case OP_AND: a = b & c; break;
          case OP_OR: a = b | c; break;
          case OP_XOR: a = b ^ c; break;
          case OP_NOR: a = ~(b | c); break;
          case OP_CLZ: a = b ? (uint32_t)__builtin_clz(b) : 32u; break;
          default: a = (~b) ? (uint32_t)__builtin_clz(~b) : 32u; break; /* CLO */
        }
        if (write_hi) { m.regs[32] = a; m.regs[33] = hi; }
        else if (in->op_a) m.regs[in->op_a] = a;
        if (in->op_a == 0 && !write_hi) { /* $zero stays 0 */ }
        break;
      }
      case OP_LB: case OP_LBU: case OP_LH: case OP_LHU: case OP_LW:
      case OP_LWL: case OP_LWR: case OP_LL: {
        uint32_t rs = in->imm_b ? in->op_b : m.regs[in->op_b];
        uint32_t addr = rs + in->op_c;
        uint32_t aligned = addr & ~3u;
        if (aligned < 0x1000u) { status = EXIT_BAD_MEMORY; goto done; }
        uint32_t mem = mem_rd(&m, aligned), i = addr & 3u, val;
        uint32_t rt = m.regs[in->op_a];
        switch (op) {
          case OP_LW: case OP_LL: val = mem; break;
          case OP_LB: val = (uint32_t)(int32_t)(int8_t)(mem >> (i * 8)); break;
          case OP_LBU: val = (mem >> (i * 8)) & 0xFF; break;
          case OP_LH: val = (uint32_t)(int32_t)(int16_t)(mem >> ((addr & 2) * 8)); break;
          case OP_LHU: val = (mem >> ((addr & 2) * 8)) & 0xFFFF; break;
          case OP_LWL: { uint32_t sh = 24 - i * 8, mask = MASK32 << sh; val = (rt & ~mask) | ((mem << sh) & mask); break; }
          default: { uint32_t sh = i * 8, mask = MASK32 >> sh; val = (rt & ~mask) | (mem >> sh); break; } /* LWR */
        }
        if (in->op_a) m.regs[in->op_a] = val;
        break;
      }
      case OP_SB: case OP_SH: case OP_SW: case OP_SWL: case OP_SWR: case OP_SC: {
        uint32_t rs = in->imm_b ? in->op_b : m.regs[in->op_b];
        uint32_t rt = m.regs[in->op_a];
        uint32_t addr = rs + in->op_c;
        uint32_t aligned = addr & ~3u;
        if (aligned < 0x1000u) { status = EXIT_BAD_MEMORY; goto done; }
        uint32_t mem = mem_rd(&m, aligned), i = addr & 3u, val;
        switch (op) {
          case OP_SW: case OP_SC: val = rt; break;
          case OP_SB: { uint32_t sh = i * 8; val = (mem & ~(0xFFu << sh)) | ((rt & 0xFF) << sh); break; }
          case OP_SH: { uint32_t sh = (addr & 2) * 8; val = (mem & ~(0xFFFFu << sh)) | ((rt & 0xFFFF) << sh); break; }
          case OP_SWL: { uint32_t sh = 24 - i * 8, mask = MASK32 >> sh; val = (mem & ~mask) | (rt >> sh); break; }
          default: { uint32_t sh = i * 8, mask = MASK32 << sh; val = (mem & ~mask) | ((rt << sh) & mask); break; } /* SWR */
        }
        mem_wr(&m, aligned, val);
        if (op == OP_SC && in->op_a) m.regs[in->op_a] = 1;
        break;
      }
      case OP_BEQ: case OP_BNE: case OP_BGEZ: case OP_BGTZ: case OP_BLEZ: case OP_BLTZ: {
        uint32_t s1 = m.regs[in->op_a];
        uint32_t s2 = in->imm_b ? 0 : m.regs[in->op_b];
        int take;
        switch (op) {
          case OP_BEQ: take = s1 == s2; break;
          case OP_BNE: take = s1 != s2; break;
          case OP_BGEZ: take = (int32_t)s1 >= 0; break;
          case OP_BGTZ: take = (int32_t)s1 > 0; break;
          case OP_BLEZ: take = (int32_t)s1 <= 0; break;
          default: take = (int32_t)s1 < 0; break;
        }
        if (take) next_next_pc = in->op_c + next_pc;
        break;
      }
      case OP_JUMP: case OP_JUMPI: case OP_JUMPDIRECT: {
        uint32_t target = (op == OP_JUMP) ? m.regs[in->op_b]
                         : (op == OP_JUMPI) ? in->op_b
                         : in->op_b + next_pc;
        uint32_t ret = next_pc + 4;
        if (in->op_a) m.regs[in->op_a] = ret;
        next_next_pc = target;
        break;
      }
      case OP_MEQ: case OP_MNE: {
        c = m.regs[in->op_c];
        b = m.regs[in->op_b];
        int mv = (op == OP_MEQ) ? (c == 0) : (c != 0);
        if (mv && in->op_a) m.regs[in->op_a] = b;
        break;
      }
      case OP_WSBH: {
        b = m.regs[in->op_b];
        a = (((b >> 16) & 0xFF) << 24) | (((b >> 24) & 0xFF) << 16) | ((b & 0xFF) << 8) | ((b >> 8) & 0xFF);
        if (in->op_a) m.regs[in->op_a] = a;
        break;
      }
      case OP_SEXT: {
        b = m.regs[in->op_b];
        a = in->op_c ? (uint32_t)(int32_t)(int16_t)b : (uint32_t)(int32_t)(int8_t)b;
        if (in->op_a) m.regs[in->op_a] = a;
        break;
      }
      case OP_EXT: {
        b = m.regs[in->op_b];
        uint32_t msbd = in->op_c >> 5, lsb = in->op_c & 31;
        uint32_t mask = (msbd + lsb + 1 == 32) ? MASK32 : ((1u << (msbd + lsb + 1)) - 1);
        if (in->op_a) m.regs[in->op_a] = (b & mask) >> lsb;
        break;
      }
      case OP_INS: {
        b = m.regs[in->op_b];
        uint32_t prev = m.regs[in->op_a];
        uint32_t msb = in->op_c >> 5, lsb = in->op_c & 31;
        uint32_t mask = (msb - lsb + 1 == 32) ? MASK32 : ((1u << (msb - lsb + 1)) - 1);
        uint32_t mf = mask << lsb;
        if (in->op_a) m.regs[in->op_a] = (prev & ~mf) | ((b << lsb) & mf);
        break;
      }
      case OP_TEQ: {
        if (m.regs[in->op_a] == m.regs[in->op_b]) { status = EXIT_TRAP; goto done; }
        break;
      }
      case OP_MADD: case OP_MADDU: case OP_MSUB: case OP_MSUBU: {
        c = m.regs[in->op_c];
        b = m.regs[in->op_b];
        uint64_t acc = ((uint64_t)m.regs[33] << 32) | m.regs[32];
        uint64_t prod = (op == OP_MADD || op == OP_MSUB)
                            ? (uint64_t)((int64_t)(int32_t)b * (int32_t)c)
                            : (uint64_t)b * c;
        uint64_t o = (op == OP_MADD || op == OP_MADDU) ? acc + prod : acc - prod;
        m.regs[32] = (uint32_t)o;
        m.regs[33] = (uint32_t)(o >> 32);
        break;
      }
      case OP_SYSCALL: {
        int r = do_syscall(&m);
        if (r == EXIT_UNSUPPORTED_SYSCALL || r == EXIT_TRAP || r == EXIT_BAD_MEMORY) {
          status = r; goto done;
        }
        if (r != -1) m.regs[2] = m.regs[2]; /* v0 keeps id unless hint-len */
        if (m.exited) { next_pc = 0; next_next_pc = 4; }
        break;
      }
      default:
        status = EXIT_UNIMPL; goto done;
    }
    m.pc = next_pc;
    m.next_pc = next_next_pc;
    m.clk += 5;
    m.global_clk += 1;
    m.regs[0] = 0;
  }
done:
  return free_and(&m, out_regs, out_digest, out_counts, out_pv, out_stdout, status);
}

static int free_and(Machine *m, uint32_t *out_regs, uint32_t *out_digest,
                    uint64_t *out_counts, uint8_t **out_pv, uint8_t **out_stdout, int status) {
  memcpy(out_regs, m->regs, sizeof(m->regs));
  memcpy(out_digest, m->digest, sizeof(m->digest));
  out_counts[0] = m->global_clk;
  out_counts[1] = m->clk;
  out_counts[2] = m->exit_code;
  out_counts[3] = m->pv_len;
  *out_pv = m->pv_stream;
  out_counts[4] = m->so_len;
  *out_stdout = m->stdout_buf;
  for (uint32_t i = 0; i < NUM_PAGES; i++)
    if (m->pages[i]) free(m->pages[i]);
  free(m->pages);
  return status;
}

void zkm_free(uint8_t *p) { free(p); }
