/* MIPS32r2 trace-mode interpreter: emits per-cycle event columns.
 *
 * The native fast path for proving (the analog of the reference's Rust
 * executor + C++ event encoders, crates/core/executor/src/executor.rs +
 * core/machine/cpp/extern.cpp): each cycle appends one row of the packed
 * column layout consumed by zkmips_tpu.executor.columnar (CPU_DTYPE), and
 * memory cells carry (value, shard, timestamp) records so access rows carry
 * their previous-record triples.  Per-shard local memory chains and the
 * whole-run init/finalize sets are tracked natively.
 *
 * Python (executor/native_trace.py) differentially tests this against the
 * pure-Python interpreter, which stays the semantic reference.  Unsupported
 * syscalls (precompiles, hooks, unconstrained mode, cycle trackers) return
 * TR_UNSUPPORTED and the caller re-runs entirely in Python.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint8_t u8;
typedef uint32_t u32;
typedef uint64_t u64;

#define PAGE_BITS 14u
#define PAGE_WORDS (1u << (PAGE_BITS - 2u))
#define NUM_PAGES (1u << (31u - PAGE_BITS))
#define MASK32 0xFFFFFFFFu
#define MAX_MEMORY 0x7F000000u

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
};

enum {
  TR_OK = 0,          /* shard filled, more to run */
  TR_DONE = 1,        /* program exited */
  TR_MAX_CYCLES = 2,
  TR_UNSUPPORTED = 3, /* fall back to Python for the whole run */
  TR_ERROR = 4,       /* guest fault (trap / bad memory / bad hint) */
};

/* column indices; MUST match executor/columnar.py CPU_DTYPE order */
enum {
  C_CLK, C_PC, C_NEXT_PC, C_NNPC, C_OPCODE, C_OP_A, C_OP_B, C_OP_C,
  C_IMM_B, C_IMM_C, C_A, C_B, C_C, C_PA, C_SYSCALL,
  C_A_PS, C_A_PT, C_A_PV, C_B_PS, C_B_PT, C_B_PV, C_C_PS, C_C_PT, C_C_PV,
  C_HI_HAS, C_HI_PS, C_HI_PT, C_HI_PV, C_HIW, C_HP,
  C_MEM_HAS, C_MEM_ADDR, C_MEM_VAL, C_MEM_PS, C_MEM_PT, C_MEM_PV,
  NCOLS,
};

enum { POS_MEMORY = 0, POS_C = 1, POS_B = 2, POS_A = 3, POS_HI = 4 };
enum { R_ZERO = 0, R_V0 = 2, R_A0 = 4, R_A1 = 5, R_A2 = 6, R_LO = 32, R_HI = 33 };

typedef struct {
  uint8_t opcode;
  uint8_t op_a;
  uint8_t imm_b;
  uint8_t imm_c;
  uint32_t op_b;
  uint32_t op_c;
} Insn;

typedef struct {
  u32 *val;
  u32 *shard;
  u32 *ts;
  u8 *present;  /* 1 bit per word: has a live memory record */
  u8 *uninit;   /* 1 bit per word: value seeded by a hint read */
} TPage;

typedef struct {
  u32 addr;
  u32 i_val, i_shard, i_ts;
  u32 f_val, f_shard, f_ts;
} LocalEnt;

typedef struct {
  TPage *pages;
  /* registers: cells 0..35 */
  u32 reg_val[36], reg_shard[36], reg_ts[36];
  u8 reg_present[36], reg_uninit[36];

  const Insn *insns;
  u32 num_insns, pc_base;
  u32 pc, next_pc;
  u64 clk, global_clk;
  u32 shard;
  u32 exited, exit_code;
  u32 delay_pending;

  /* io */
  const u8 *const *hints;
  const u64 *hint_lens;
  u32 num_hints, hint_ptr;
  u32 digest[8];
  u32 def_digest[8]; /* COMMIT_DEFERRED_PROOFS words */
  u8 *pv_stream;
  u64 pv_len, pv_cap;
  u8 *stdout_buf;
  u64 so_len, so_cap;

  /* whole-run touched set (first-touch order) + initial values */
  u32 *touch_addr;
  u32 *touch_init;
  u64 touch_len, touch_cap;

  /* per-shard local chain map: open addressing into dense entries */
  u32 *lmap;      /* slot -> entry index + 1 (0 = empty), keyed by addr */
  u32 lmap_cap;   /* power of two */
  LocalEnt *lent;
  u32 lent_len, lent_cap;

  /* current row being filled */
  u32 *row;
  int err;
} TM;

static TPage *tpage(TM *m, u32 addr) {
  u32 p = addr >> PAGE_BITS;
  TPage *pg = &m->pages[p];
  if (!pg->val) {
    pg->val = (u32 *)calloc(PAGE_WORDS, 4);
    pg->shard = (u32 *)calloc(PAGE_WORDS, 4);
    pg->ts = (u32 *)calloc(PAGE_WORDS, 4);
    pg->present = (u8 *)calloc(PAGE_WORDS / 8, 1);
    pg->uninit = (u8 *)calloc(PAGE_WORDS / 8, 1);
  }
  return pg;
}

/* cell accessors unifying registers (<36) and memory */
typedef struct {
  u32 *val, *shard, *ts;
  u8 *present, *uninit;
  u32 bit;
} Cell;

static Cell cell_of(TM *m, u32 addr) {
  Cell c;
  if (addr < 36u) {
    c.val = &m->reg_val[addr];
    c.shard = &m->reg_shard[addr];
    c.ts = &m->reg_ts[addr];
    c.present = &m->reg_present[addr];
    c.uninit = &m->reg_uninit[addr];
    c.bit = 1u;  /* whole byte used as the flag */
    return c;
  }
  TPage *pg = tpage(m, addr);
  u32 w = (addr & ((1u << PAGE_BITS) - 1u)) >> 2;
  c.val = &pg->val[w];
  c.shard = &pg->shard[w];
  c.ts = &pg->ts[w];
  c.present = &pg->present[w >> 3];
  c.uninit = &pg->uninit[w >> 3];
  c.bit = 1u << (w & 7u);
  return c;
}

static void touch_push(TM *m, u32 addr, u32 init_val) {
  if (m->touch_len == m->touch_cap) {
    m->touch_cap *= 2;
    m->touch_addr = (u32 *)realloc(m->touch_addr, m->touch_cap * 4);
    m->touch_init = (u32 *)realloc(m->touch_init, m->touch_cap * 4);
  }
  m->touch_addr[m->touch_len] = addr;
  m->touch_init[m->touch_len] = init_val;
  m->touch_len++;
}

/* ensure a live record exists; returns the cell. On first touch the cell
 * value (image/hint-seeded or zero) becomes the initial record (shard 0,
 * ts 0), mirroring Python _load_initial. */
static Cell load_cell(TM *m, u32 addr) {
  Cell c = cell_of(m, addr);
  if (!(*c.present & c.bit)) {
    *c.present |= c.bit;
    *c.shard = 0;
    *c.ts = 0;
    touch_push(m, addr, *c.val);
  }
  return c;
}

/* local chain map ---------------------------------------------------------*/

static void lmap_reset(TM *m) {
  memset(m->lmap, 0, (u64)m->lmap_cap * 4);
  m->lent_len = 0;
}

static void lmap_grow(TM *m) {
  u32 old_cap = m->lmap_cap;
  m->lmap_cap *= 2;
  free(m->lmap);
  m->lmap = (u32 *)calloc(m->lmap_cap, 4);
  for (u32 e = 0; e < m->lent_len; e++) {
    u32 h = (m->lent[e].addr * 2654435761u) & (m->lmap_cap - 1);
    while (m->lmap[h]) h = (h + 1) & (m->lmap_cap - 1);
    m->lmap[h] = e + 1;
  }
  (void)old_cap;
}

static void track_local(TM *m, u32 addr, u32 pv, u32 ps, u32 pt, u32 nv, u32 ns, u32 nt) {
  u32 mask = m->lmap_cap - 1;
  u32 h = (addr * 2654435761u) & mask;
  while (m->lmap[h]) {
    LocalEnt *e = &m->lent[m->lmap[h] - 1];
    if (e->addr == addr) {
      e->f_val = nv; e->f_shard = ns; e->f_ts = nt;
      return;
    }
    h = (h + 1) & mask;
  }
  if (m->lent_len == m->lent_cap) {
    m->lent_cap *= 2;
    m->lent = (LocalEnt *)realloc(m->lent, (u64)m->lent_cap * sizeof(LocalEnt));
  }
  LocalEnt *e = &m->lent[m->lent_len++];
  e->addr = addr;
  e->i_val = pv; e->i_shard = ps; e->i_ts = pt;
  e->f_val = nv; e->f_shard = ns; e->f_ts = nt;
  m->lmap[h] = m->lent_len;
  if (m->lent_len * 2 >= m->lmap_cap) lmap_grow(m);
}

/* record accesses ---------------------------------------------------------*/

static void emit_acc(u32 *row, int base, u32 ps, u32 pt, u32 pv) {
  row[base] = ps;
  row[base + 1] = pt;
  row[base + 2] = pv;
}

/* read with record at position pos; returns value */
static u32 mr(TM *m, u32 addr, u32 pos) {
  Cell c = load_cell(m, addr);
  u32 pv = *c.val, ps = *c.shard, pt = *c.ts;
  u32 nt = (u32)m->clk + pos;
  *c.shard = m->shard;
  *c.ts = nt;
  track_local(m, addr, pv, ps, pt, pv, m->shard, nt);
  switch (pos) {
    case POS_A: emit_acc(m->row, C_A_PS, ps, pt, pv); break;
    case POS_B: emit_acc(m->row, C_B_PS, ps, pt, pv); break;
    case POS_C: emit_acc(m->row, C_C_PS, ps, pt, pv); break;
    case POS_MEMORY:
      m->row[C_MEM_HAS] = 1;
      m->row[C_MEM_ADDR] = addr;
      m->row[C_MEM_VAL] = pv;
      emit_acc(m->row, C_MEM_PS, ps, pt, pv);
      break;
  }
  return pv;
}

static void mw(TM *m, u32 addr, u32 val, u32 pos) {
  Cell c = load_cell(m, addr);
  u32 pv = *c.val, ps = *c.shard, pt = *c.ts;
  u32 nt = (u32)m->clk + pos;
  if (addr == R_ZERO && pos != POS_MEMORY) val = 0;
  *c.val = val;
  *c.shard = m->shard;
  *c.ts = nt;
  track_local(m, addr, pv, ps, pt, val, m->shard, nt);
  switch (pos) {
    case POS_A: emit_acc(m->row, C_A_PS, ps, pt, pv); break;
    case POS_HI:
      m->row[C_HI_HAS] = 1;
      emit_acc(m->row, C_HI_PS, ps, pt, pv);
      m->row[C_HIW] = val;
      m->row[C_HP] = pv;
      break;
    case POS_MEMORY:
      m->row[C_MEM_HAS] = 1;
      m->row[C_MEM_ADDR] = addr;
      m->row[C_MEM_VAL] = val;
      emit_acc(m->row, C_MEM_PS, ps, pt, pv);
      break;
  }
}

/* register peek (Python register()): creates the initial record on first
 * touch (joins the init/finalize set) but no access row / local chain */
static u32 peek_reg(TM *m, u32 addr) {
  Cell c = load_cell(m, addr);
  return *c.val;
}

/* memory word peek (Python word()): no records at all */
static u32 peek_word(TM *m, u32 addr) {
  Cell c = cell_of(m, addr);
  return *c.val;
}

static u32 peek_byte(TM *m, u32 addr) {
  return (u8)(peek_word(m, addr & ~3u) >> ((addr & 3u) * 8u));
}

static inline u32 ror32(u32 x, u32 r) {
  r &= 31u;
  return r ? ((x >> r) | (x << (32u - r))) : x;
}

static inline int32_t s32(u32 x) { return (int32_t)x; }

static u32 clz32(u32 x) { return x ? (u32)__builtin_clz(x) : 32u; }

/* syscalls (HALT / WRITE fd1-3 / COMMIT / HINTLEN / HINTREAD only) */
static int do_syscall(TM *m, u32 id, u32 b, u32 c, u32 *res, int *has_res,
                      u32 *next_pc, u32 *nnpc) {
  *has_res = 0;
  switch (id) {
    case 0x00000000: /* HALT */
      if (b != 0) return TR_ERROR;
      m->exited = 1;
      m->exit_code = 0;
      *next_pc = 0;
      *nnpc = 4;
      return TR_OK;
    case 0x00000002: { /* WRITE */
      u32 nbytes = peek_reg(m, R_A2);
      if (b >= 4) return TR_UNSUPPORTED; /* hook/hint fds need the host */
      if (b == 1 || b == 2) {
        /* cycle-tracker commands are parsed by the Python write handler;
         * bail so reports stay faithful */
        static const char *pfx = "cycle-tracker";
        if (nbytes >= 13) {
          int is_tracker = 1;
          for (u32 i = 0; i < 13; i++)
            if (peek_byte(m, c + i) != (u8)pfx[i]) { is_tracker = 0; break; }
          if (is_tracker) return TR_UNSUPPORTED;
        }
        if (m->so_len + nbytes > m->so_cap) {
          while (m->so_len + nbytes > m->so_cap) m->so_cap *= 2;
          m->stdout_buf = (u8 *)realloc(m->stdout_buf, m->so_cap);
        }
        for (u32 i = 0; i < nbytes; i++) m->stdout_buf[m->so_len++] = peek_byte(m, c + i);
      } else if (b == 3) {
        if (m->pv_len + nbytes > m->pv_cap) {
          while (m->pv_len + nbytes > m->pv_cap) m->pv_cap *= 2;
          m->pv_stream = (u8 *)realloc(m->pv_stream, m->pv_cap);
        }
        for (u32 i = 0; i < nbytes; i++) m->pv_stream[m->pv_len++] = peek_byte(m, c + i);
      }
      return TR_OK;
    }
    case 0x00000010: /* COMMIT */
      if (b >= 8) return TR_ERROR;
      m->digest[b] = c;
      return TR_OK;
    case 0x0000001A: /* COMMIT_DEFERRED_PROOFS */
      if (b >= 8) return TR_ERROR;
      m->def_digest[b] = c;
      return TR_OK;
    case 0x0000001B: /* VERIFY_ZKM_PROOF needs the host proof stream */
      return TR_UNSUPPORTED;
    case 0x000000F0: /* SYSHINTLEN */
      if (m->hint_ptr >= m->num_hints) return TR_ERROR;
      *res = (u32)m->hint_lens[m->hint_ptr];
      *has_res = 1;
      return TR_OK;
    case 0x000000F1: { /* SYSHINTREAD */
      if (m->hint_ptr >= m->num_hints) return TR_ERROR;
      const u8 *buf = m->hints[m->hint_ptr];
      u64 len = m->hint_lens[m->hint_ptr];
      m->hint_ptr++;
      /* Python dispatch: _hint_read(ex, b, c) with b=ptr, c=len */
      if (len != c || (b & 3u)) return TR_ERROR;
      for (u64 i = 0; i < len; i += 4) {
        u32 w = 0;
        for (int j = 0; j < 4 && i + (u64)j < len; j++) w |= ((u32)buf[i + j]) << (8 * j);
        u32 addr = b + (u32)i;
        Cell cl = cell_of(m, addr);
        if (*cl.uninit & cl.bit) return TR_ERROR;       /* duplicate hint */
        if (*cl.present & cl.bit) return TR_UNSUPPORTED; /* degenerate: late hint */
        *cl.uninit |= cl.bit;
        *cl.val = w;
      }
      return TR_OK;
    }
    default:
      return TR_UNSUPPORTED;
  }
}

/* public API ---------------------------------------------------------------*/

TM *zkm_trace_new(const Insn *insns, u32 num_insns, u32 pc_base, u32 pc_start,
                  const u32 *image_addrs, const u32 *image_vals, u32 image_len,
                  const u8 *const *hints, const u64 *hint_lens, u32 num_hints) {
  TM *m = (TM *)calloc(1, sizeof(TM));
  m->pages = (TPage *)calloc(NUM_PAGES, sizeof(TPage));
  m->insns = insns;
  m->num_insns = num_insns;
  m->pc_base = pc_base;
  m->pc = pc_start;
  m->next_pc = pc_start + 4;
  m->shard = 1;
  m->hints = hints;
  m->hint_lens = hint_lens;
  m->num_hints = num_hints;
  m->pv_cap = 1024;
  m->pv_stream = (u8 *)malloc(m->pv_cap);
  m->so_cap = 1024;
  m->stdout_buf = (u8 *)malloc(m->so_cap);
  m->touch_cap = 1024;
  m->touch_addr = (u32 *)malloc(m->touch_cap * 4);
  m->touch_init = (u32 *)malloc(m->touch_cap * 4);
  m->lmap_cap = 1 << 12;
  m->lmap = (u32 *)calloc(m->lmap_cap, 4);
  m->lent_cap = 1 << 11;
  m->lent = (LocalEnt *)malloc((u64)m->lent_cap * sizeof(LocalEnt));
  /* seed image into cells without records (first access promotes) */
  for (u32 i = 0; i < image_len; i++) {
    Cell c = cell_of(m, image_addrs[i]);
    *c.val = image_vals[i];
  }
  return m;
}

void zkm_trace_free(TM *m) {
  for (u32 i = 0; i < NUM_PAGES; i++) {
    TPage *p = &m->pages[i];
    if (p->val) { free(p->val); free(p->shard); free(p->ts); free(p->present); free(p->uninit); }
  }
  free(m->pages);
  free(m->pv_stream);
  free(m->stdout_buf);
  free(m->touch_addr);
  free(m->touch_init);
  free(m->lmap);
  free(m->lent);
  free(m);
}

/* Run one shard: fills cols (cap_rows x NCOLS u32, row-major) and the local
 * chain buffer (cap_local x 7 u32).  out_meta:
 *   [0]=rows, [1]=num_local, [2]=shard_index, [3]=exit_code,
 *   [4]=pv_len, [5]=stdout_len, [6]=global_clk_lo, [7]=global_clk_hi
 * Returns TR_*; shard counter advances on TR_OK. */
int zkm_trace_shard(TM *m, u64 shard_size, u64 max_cycles,
                    u32 *cols, u64 cap_rows, u32 *local7, u64 cap_local,
                    u64 *out_meta, u32 *out_digest8) {
  u64 rows = 0;
  int status = -1;
  lmap_reset(m);
  m->clk = 0;

  while (1) {
    if (m->exited || m->pc == 0) { status = TR_DONE; break; }
    if (m->global_clk >= max_cycles) { status = TR_MAX_CYCLES; break; }
    if (rows + 1 > cap_rows) { status = TR_ERROR; break; }
    u32 idx = (m->pc - m->pc_base) >> 2;
    if (idx >= m->num_insns) { status = TR_ERROR; break; }
    const Insn *in = &m->insns[idx];
    u32 op = in->opcode;
    u32 pc = m->pc, next_pc = m->next_pc, nnpc = (m->next_pc + 4) & MASK32;
    u32 a = 0, b = 0, c = 0, pa = 0;
    u32 syscall_lo16 = 0;
    u64 extra_cycles = 0;
    int was_delay_pending = m->delay_pending;
    m->delay_pending = 0;

    u32 *row = &cols[rows * NCOLS];
    memset(row, 0, NCOLS * 4);
    m->row = row;

    if (op <= OP_CLO) { /* ALU */
      if (!in->imm_c) { c = mr(m, in->op_c, POS_C); b = mr(m, in->op_b, POS_B); }
      else if (!in->imm_b) { b = mr(m, in->op_b, POS_B); c = in->op_c; }
      else { b = in->op_b; c = in->op_c; }
      if ((op == OP_DIV || op == OP_DIVU || op == OP_MOD || op == OP_MODU) && c == 0) {
        status = TR_ERROR; break;
      }
      u32 hi = 0;
      int lohi = 0;
      switch (op) {
        case OP_ADD: a = b + c; break;
        case OP_SUB: a = b - c; break;
        case OP_SLL: a = b << (c & 31); break;
        case OP_SRL: a = b >> (c & 31); break;
        case OP_SRA: a = (u32)(s32(b) >> (c & 31)); break;
        case OP_ROR: a = ror32(b, c); break;
        case OP_MUL: a = b * c; break;
        case OP_SLTU: a = b < c; break;
        case OP_SLT: a = s32(b) < s32(c); break;
        case OP_MULT: { int64_t o = (int64_t)s32(b) * s32(c); a = (u32)o; hi = (u32)((u64)o >> 32); lohi = 1; break; }
        case OP_MULTU: { u64 o = (u64)b * c; a = (u32)o; hi = (u32)(o >> 32); lohi = 1; break; }
        case OP_DIV: {
          /* C truncated division matches Python _div_s / _rem_s */
          int64_t sb = s32(b), sc = s32(c);
          a = (u32)(sb / sc); hi = (u32)(sb % sc); lohi = 1;
          break;
        }
        case OP_DIVU: a = b / c; hi = b % c; lohi = 1; break;
        case OP_MOD: { int32_t sb = s32(b), sc = s32(c); a = (u32)((int64_t)sb % sc); break; }
        case OP_MODU: a = b % c; break;
        case OP_AND: a = b & c; break;
        case OP_OR: a = b | c; break;
        case OP_XOR: a = b ^ c; break;
        case OP_NOR: a = ~(b | c); break;
        case OP_CLZ: a = clz32(b); break;
        default: a = clz32(~b); break; /* CLO */
      }
      if (lohi) {
        mw(m, R_LO, a, POS_A);
        mw(m, R_HI, hi, POS_HI);
        pa = hi;
      } else {
        mw(m, in->op_a, a, POS_A);
      }
    } else if (op >= OP_LB && op <= OP_LL) { /* loads */
      u32 rs = mr(m, in->op_b, POS_B);
      u32 rt = peek_reg(m, in->op_a);
      u32 addr = (rs + in->op_c) & MASK32;
      u32 aligned = addr & 0xFFFFFFFCu;
      if (aligned < 0x1000u) { status = TR_ERROR; break; }
      if ((op == OP_LW || op == OP_LL) && (addr & 3u)) { status = TR_ERROR; break; }
      if ((op == OP_LH || op == OP_LHU) && (addr & 1u)) { status = TR_ERROR; break; }
      u32 mem = mr(m, aligned, POS_MEMORY);
      if (aligned + 3u > MAX_MEMORY) { status = TR_ERROR; break; }
      u32 i = addr & 3u, val;
      switch (op) {
        case OP_LW: case OP_LL: val = mem; break;
        case OP_LB: val = (u32)(int32_t)(int8_t)(mem >> (i * 8)); break;
        case OP_LBU: val = (mem >> (i * 8)) & 0xFF; break;
        case OP_LH: val = (u32)(int32_t)(int16_t)(mem >> ((addr & 2u) * 8)); break;
        case OP_LHU: val = (mem >> ((addr & 2u) * 8)) & 0xFFFF; break;
        case OP_LWL: { u32 sh = 24 - i * 8, mask = MASK32 << sh; val = (rt & ~mask) | ((mem << sh) & mask); break; }
        default: { u32 sh = i * 8, mask = MASK32 >> sh; val = (rt & ~mask) | (mem >> sh); break; } /* LWR */
      }
      mw(m, in->op_a, val, POS_A);
      pa = rt; a = val; b = rs; c = in->op_c;
    } else if (op >= OP_SB && op <= OP_SC) { /* stores */
      u32 rs = mr(m, in->op_b, POS_B);
      u32 rt = (op == OP_SC) ? peek_reg(m, in->op_a) : mr(m, in->op_a, POS_A);
      u32 addr = (rs + in->op_c) & MASK32;
      u32 aligned = addr & 0xFFFFFFFCu;
      u32 mem = peek_word(m, aligned);
      u32 i = addr & 3u, val;
      switch (op) {
        case OP_SB: { u32 sh = i * 8; val = (mem & ~(0xFFu << sh)) | ((rt & 0xFF) << sh); break; }
        case OP_SH:
          if (addr & 1u) { status = TR_ERROR; goto done; }
          { u32 sh = (addr & 2u) * 8; val = (mem & ~(0xFFFFu << sh)) | ((rt & 0xFFFF) << sh); }
          break;
        case OP_SWL: { u32 sh = 24 - i * 8, mask = MASK32 >> sh; val = (mem & ~mask) | (rt >> sh); break; }
        case OP_SW: case OP_SC:
          if (addr & 3u) { status = TR_ERROR; goto done; }
          val = rt;
          break;
        default: { u32 sh = i * 8, mask = MASK32 << sh; val = (mem & ~mask) | ((rt << sh) & mask); break; } /* SWR */
      }
      if (aligned + 3u > MAX_MEMORY || aligned < 0x1000u) { status = TR_ERROR; break; }
      mw(m, aligned, val, POS_MEMORY);
      if (op == OP_SC) {
        mw(m, in->op_a, 1, POS_A);
        pa = rt; a = 1; b = rs; c = in->op_c;
      } else {
        pa = rt; a = rt; b = rs; c = in->op_c;
      }
    } else if (op >= OP_BEQ && op <= OP_BNE) { /* branches */
      if (op == OP_BGEZ || op == OP_BGTZ || op == OP_BLEZ || op == OP_BLTZ) b = 0;
      else b = mr(m, in->op_b, POS_B);
      a = mr(m, in->op_a, POS_A);
      c = in->op_c;
      int take;
      switch (op) {
        case OP_BEQ: take = a == b; break;
        case OP_BNE: take = a != b; break;
        case OP_BGEZ: take = s32(a) >= 0; break;
        case OP_BGTZ: take = s32(a) > 0; break;
        case OP_BLEZ: take = s32(a) <= 0; break;
        default: take = s32(a) < 0; break;
      }
      if (take) nnpc = (in->op_c + next_pc) & MASK32;
      m->delay_pending = 1;
    } else if (op >= OP_JUMP && op <= OP_JUMPDIRECT) {
      u32 target, ret = (next_pc + 4) & MASK32;
      if (op == OP_JUMP) { target = mr(m, in->op_b, POS_B); b = target; }
      else if (op == OP_JUMPI) { target = in->op_b; b = target; }
      else { target = (in->op_b + next_pc) & MASK32; b = in->op_b; }
      mw(m, in->op_a, ret, POS_A);
      a = ret; c = 0;
      nnpc = target;
      m->delay_pending = 1;
    } else if (op == OP_MEQ || op == OP_MNE) {
      u32 a0 = peek_reg(m, in->op_a);
      pa = a0;
      c = mr(m, in->op_c, POS_C);
      b = mr(m, in->op_b, POS_B);
      int mv = (op == OP_MEQ) ? (c == 0) : (c != 0);
      a = mv ? b : a0;
      mw(m, in->op_a, a, POS_A);
    } else if (op == OP_WSBH) {
      b = mr(m, in->op_b, POS_B);
      a = (((b >> 16) & 0xFF) << 24) | (((b >> 24) & 0xFF) << 16) | ((b & 0xFF) << 8) | ((b >> 8) & 0xFF);
      mw(m, in->op_a, a, POS_A);
      c = 0;
    } else if (op == OP_SEXT) {
      b = mr(m, in->op_b, POS_B);
      c = in->op_c;
      a = c > 0 ? (u32)(int32_t)(int16_t)b : (u32)(int32_t)(int8_t)b;
      mw(m, in->op_a, a, POS_A);
    } else if (op == OP_EXT) {
      b = mr(m, in->op_b, POS_B);
      c = in->op_c;
      u32 msbd = c >> 5, lsb = c & 31;
      u32 mask = (msbd + lsb + 1 == 32) ? MASK32 : ((1u << (msbd + lsb + 1)) - 1);
      a = (b & mask) >> lsb;
      mw(m, in->op_a, a, POS_A);
    } else if (op == OP_INS) {
      b = mr(m, in->op_b, POS_B);
      u32 prev = peek_reg(m, in->op_a);
      pa = prev;
      c = in->op_c;
      u32 msb = c >> 5, lsb = c & 31;
      u32 mask = (msb - lsb + 1 == 32) ? MASK32 : ((1u << (msb - lsb + 1)) - 1);
      u32 mf = mask << lsb;
      a = (prev & ~mf) | ((b << lsb) & mf);
      mw(m, in->op_a, a, POS_A);
    } else if (op == OP_TEQ) {
      u32 src2 = mr(m, in->op_b, POS_B);
      u32 src1 = mr(m, in->op_a, POS_A);
      if (src1 == src2) { status = TR_ERROR; break; }
      a = src1; b = src2; c = 0;
    } else if (op >= OP_MADDU && op <= OP_MSUB) {
      c = mr(m, in->op_c, POS_C);
      b = mr(m, in->op_b, POS_B);
      u32 lo_val = peek_reg(m, R_LO), hi_val = peek_reg(m, R_HI);
      u64 acc = ((u64)hi_val << 32) | lo_val;
      u64 prod = (op == OP_MADD || op == OP_MSUB)
                     ? (u64)((int64_t)s32(b) * s32(c))
                     : (u64)b * c;
      u64 o = (op == OP_MADD || op == OP_MADDU) ? acc + prod : acc - prod;
      mw(m, R_LO, (u32)o, POS_A);
      mw(m, R_HI, (u32)(o >> 32), POS_HI);
      pa = lo_val;
      a = (u32)o;
    } else if (op == OP_SYSCALL) {
      u32 id = peek_reg(m, R_V0);
      c = mr(m, R_A1, POS_C);
      b = mr(m, R_A0, POS_B);
      pa = id;
      syscall_lo16 = id & 0xFFFF;
      u32 res = 0;
      int has_res = 0;
      int r = do_syscall(m, id, b, c, &res, &has_res, &next_pc, &nnpc);
      if (r != TR_OK) { status = r; break; }
      a = has_res ? res : id;
      mw(m, R_V0, a, POS_A);
      extra_cycles = 0; /* none of the supported syscalls carry extra cycles */
    } else {
      status = TR_UNSUPPORTED;
      break;
    }

    if (nnpc == 0 && !m->exited) { status = TR_ERROR; break; }

    row[C_CLK] = (u32)m->clk;
    row[C_PC] = pc;
    row[C_NEXT_PC] = next_pc;
    row[C_NNPC] = nnpc;
    row[C_OPCODE] = op;
    row[C_OP_A] = in->op_a;
    row[C_OP_B] = in->op_b;
    row[C_OP_C] = in->op_c;
    row[C_IMM_B] = in->imm_b;
    row[C_IMM_C] = in->imm_c;
    row[C_A] = a;
    row[C_B] = b;
    row[C_C] = c;
    row[C_PA] = pa;
    row[C_SYSCALL] = syscall_lo16;
    rows++;

    m->pc = next_pc;
    m->next_pc = nnpc;
    m->clk += 5 + extra_cycles;
    m->global_clk += 1;
    (void)was_delay_pending;

    if (!m->delay_pending && rows >= shard_size) { status = TR_OK; break; }
  }

done:
  /* dump local chains */
  u64 nl = m->lent_len;
  if (nl > cap_local) nl = cap_local;
  for (u64 i = 0; i < nl; i++) {
    LocalEnt *e = &m->lent[i];
    u32 *o = &local7[i * 7];
    o[0] = e->addr;
    o[1] = e->i_val; o[2] = e->i_shard; o[3] = e->i_ts;
    o[4] = e->f_val; o[5] = e->f_shard; o[6] = e->f_ts;
  }
  out_meta[0] = rows;
  out_meta[1] = nl;
  out_meta[2] = m->shard;
  out_meta[3] = m->exit_code;
  out_meta[4] = m->pv_len;
  out_meta[5] = m->so_len;
  out_meta[6] = (u32)(m->global_clk & MASK32);
  out_meta[7] = (u32)(m->global_clk >> 32);
  memcpy(out_digest8, m->digest, 32);
  memcpy(out_digest8 + 8, m->def_digest, 32);
  if (status == TR_OK || status == TR_DONE) {
    m->shard += 1;
  }
  return status;
}

/* whole-run touched set + final records (call after the last shard) */
u64 zkm_trace_touched_len(TM *m) { return m->touch_len; }

void zkm_trace_finalize(TM *m, u32 *out6) {
  for (u64 i = 0; i < m->touch_len; i++) {
    u32 addr = m->touch_addr[i];
    Cell c = cell_of(m, addr);
    u32 *o = &out6[i * 6];
    o[0] = addr;
    /* init value preference: hint-seeded (uninit) else image/zero; the
     * first-touch snapshot recorded exactly that */
    o[1] = m->touch_init[i];
    o[2] = *c.val;
    o[3] = *c.shard;
    o[4] = *c.ts;
    o[5] = 0;
  }
}

void zkm_trace_io(TM *m, u8 *pv_out, u8 *stdout_out, u32 *digest_out) {
  if (pv_out) memcpy(pv_out, m->pv_stream, m->pv_len);
  if (stdout_out) memcpy(stdout_out, m->stdout_buf, m->so_len);
  if (digest_out) {
    memcpy(digest_out, m->digest, 32);
    memcpy(digest_out + 8, m->def_digest, 32);
  }
}
