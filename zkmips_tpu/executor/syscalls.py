"""Syscall dispatch (host side).

Mirrors the reference's syscall layer (crates/core/executor/src/syscalls/):
HALT steers next_pc to 0 and carries the exit code (halt.rs); WRITE routes
file descriptors to stdout/stderr/public-values/hint streams and parses
cycle-tracker commands (write.rs); COMMIT records the committed-value digest
words (commit.rs); SYSHINTLEN/SYSHINTREAD stream host inputs into
uninitialized memory (hint.rs).  Precompile syscalls are registered in
``PRECOMPILES`` as they are implemented.

Returns (result_or_None, next_pc, extra_cycles, exit_code).
"""

from __future__ import annotations

from .opcodes import Register, SyscallCode

FD_STDOUT = 1
FD_STDERR = 2
FD_PUBLIC_VALUES = 3
FD_HINT = 4

# syscall code -> callable(executor, code, b, c) -> Optional[int]
PRECOMPILES: dict = {}


def dispatch(ex, code: SyscallCode, b: int, c: int):
    next_pc = ex.next_pc
    exit_code = 0
    extra = code.num_extra_cycles
    if code == SyscallCode.HALT:
        return None, 0, extra, b
    if code == SyscallCode.WRITE:
        _write(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.SYSHINTLEN:
        if ex.input_stream_ptr >= len(ex.input_stream):
            raise _err("hint length requested but input stream is empty")
        return len(ex.input_stream[ex.input_stream_ptr]), next_pc, extra, exit_code
    if code == SyscallCode.SYSHINTREAD:
        _hint_read(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.COMMIT:
        if b >= 8:
            raise _err(f"commit word index {b} out of range")
        ex.committed_value_digest[b] = c
        return None, next_pc, extra, exit_code
    if code == SyscallCode.SHA_EXTEND:
        _sha_extend(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.SHA_COMPRESS:
        _sha_compress(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.POSEIDON2_PERMUTE:
        _poseidon2_permute(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.KECCAK_SPONGE:
        _keccak_sponge(ex, b, c)
        return None, next_pc, extra, exit_code
    if code == SyscallCode.ENTER_UNCONSTRAINED:
        ex.enter_unconstrained()
        return 1, next_pc, extra, exit_code
    if code == SyscallCode.EXIT_UNCONSTRAINED:
        ex.exit_unconstrained()
        return 0, next_pc, extra, exit_code
    impl = PRECOMPILES.get(code)
    if impl is not None:
        res = impl(ex, code, b, c)
        return res, next_pc, extra, exit_code
    raise _err(f"unsupported syscall {code!r}")


def _err(msg):
    from .executor import ExecutionError

    return ExecutionError(msg)


def _write(ex, fd: int, buf: int):
    nbytes = ex.register(Register.A2)
    data = bytes(ex.byte(buf + i) for i in range(nbytes))
    if fd == FD_STDOUT:
        try:
            s = data.decode()
            if not _handle_cycle_tracker(ex, s):
                ex.stdout.extend(data)
        except UnicodeDecodeError:
            ex.stdout.extend(data)
    elif fd == FD_STDERR:
        ex.stdout.extend(data)
    elif fd == FD_PUBLIC_VALUES:
        ex.public_values_stream.extend(data)
    elif fd == FD_HINT:
        ex.input_stream.append(data)
    # unknown fds are ignored (hooks registry comes with precompile work)


def _handle_cycle_tracker(ex, s: str) -> bool:
    if ":" not in s:
        return False
    command, name = s.split(":", 1)
    name = name.strip()
    if command == "cycle-tracker-start" or command == "cycle-tracker-report-start":
        ex.cycle_tracker[f"_start_{name}"] = ex.global_clk
        return True
    if command == "cycle-tracker-end" or command == "cycle-tracker-report-end":
        start = ex.cycle_tracker.pop(f"_start_{name}", None)
        if start is not None:
            ex.cycle_tracker[name] = ex.cycle_tracker.get(name, 0) + ex.global_clk - start
        return True
    return False


def _hint_read(ex, ptr: int, length: int):
    if ex.input_stream_ptr >= len(ex.input_stream):
        raise _err("hint read requested but input stream is empty")
    data = ex.input_stream[ex.input_stream_ptr]
    ex.input_stream_ptr += 1
    if len(data) != length or ptr % 4 != 0:
        raise _err(f"invalid hint read args ptr={ptr:#x} len={length} data_len={len(data)}")
    for i in range(0, length, 4):
        word = int.from_bytes(data[i : i + 4].ljust(4, b"\x00"), "little")
        addr = ptr + i
        if addr in ex.uninitialized_memory:
            raise _err("hint read address already initialized")
        ex.uninitialized_memory[addr] = word


def _ror(x, r):
    return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF


def _sha_extend(ex, w_ptr: int, arg2: int):
    """SHA-256 message schedule extension (reference sha256/extend.rs)."""
    if arg2 != 0:
        raise _err("sha_extend arg2 must be 0")
    from .events import ShaExtendEvent

    clk0 = ex.clk
    r15, r2, r16, r7, wr = [], [], [], [], []
    for i in range(16, 64):
        ts = clk0 + (i - 16)
        rec = ex._mr(w_ptr + (i - 15) * 4, ts)
        r15.append(rec)
        w15 = rec.value
        s0 = _ror(w15, 7) ^ _ror(w15, 18) ^ (w15 >> 3)
        rec = ex._mr(w_ptr + (i - 2) * 4, ts)
        r2.append(rec)
        w2 = rec.value
        s1 = _ror(w2, 17) ^ _ror(w2, 19) ^ (w2 >> 10)
        rec = ex._mr(w_ptr + (i - 16) * 4, ts)
        r16.append(rec)
        w16 = rec.value
        rec = ex._mr(w_ptr + (i - 7) * 4, ts)
        r7.append(rec)
        w7 = rec.value
        w_i = (s1 + w16 + s0 + w7) & 0xFFFFFFFF
        wr.append(ex._mw(w_ptr + i * 4, w_i, ts))
    ex.record.precompile_events.setdefault("sha_extend", []).append(
        ShaExtendEvent(ex.shard, clk0, w_ptr, arg2, tuple(r15), tuple(r2), tuple(r16), tuple(r7), tuple(wr))
    )


SHA_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
    0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
    0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
    0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
    0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208, 0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]


def _sha_compress(ex, w_ptr: int, h_ptr: int):
    """SHA-256 compression (reference sha256/compress.rs)."""
    if w_ptr == h_ptr:
        raise _err("sha_compress: w_ptr must differ from h_ptr")
    from .events import ShaCompressEvent

    clk0 = ex.clk
    h_reads, w_reads, h_writes = [], [], []
    hx = []
    for i in range(8):
        rec = ex._mr(h_ptr + i * 4, clk0)
        h_reads.append(rec)
        hx.append(rec.value)
    a, b, c, d, e, f, g, h = hx
    for i in range(64):
        s1 = _ror(e, 6) ^ _ror(e, 11) ^ _ror(e, 25)
        ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
        rec = ex._mr(w_ptr + i * 4, clk0)
        w_reads.append(rec)
        temp1 = (h + s1 + ch + SHA_K[i] + rec.value) & 0xFFFFFFFF
        s0 = _ror(a, 2) ^ _ror(a, 13) ^ _ror(a, 22)
        maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
        temp2 = (s0 + maj) & 0xFFFFFFFF
        h, g, f, e, d, c, b, a = g, f, e, (d + temp1) & 0xFFFFFFFF, c, b, a, (temp1 + temp2) & 0xFFFFFFFF
    v = [a, b, c, d, e, f, g, h]
    for i in range(8):
        h_writes.append(ex._mw(h_ptr + i * 4, (hx[i] + v[i]) & 0xFFFFFFFF, clk0 + 1))
    ex.record.precompile_events.setdefault("sha_compress", []).append(
        ShaCompressEvent(ex.shard, clk0, w_ptr, h_ptr, tuple(h_reads), tuple(w_reads), tuple(h_writes))
    )


def _poseidon2_permute(ex, state_ptr: int, arg2: int):
    """Permute 16 KoalaBear words in place (reference poseidon2/permute.rs)."""
    import numpy as np

    from ..ops import field as ffield, poseidon2 as p2

    if arg2 != 0 or state_ptr % 4 != 0:
        raise _err("poseidon2_permute: bad args")
    clk0 = ex.clk
    pre = [ex.word(state_ptr + 4 * i) for i in range(16)]
    if any(v >= ffield.P for v in pre):
        raise _err("poseidon2_permute: state word out of field range")
    state = np.array([ffield.to_monty_int(v) for v in pre], dtype=np.uint32)
    post = [int(x) for x in ffield.from_monty(p2.permute(state))]
    records = [ex._mw(state_ptr + 4 * i, post[i], clk0) for i in range(16)]
    ex.record.precompile_events.setdefault("poseidon2", []).append(
        {"shard": ex.shard, "clk": clk0, "ptr": state_ptr, "pre_state": pre,
         "post_state": post, "records": records}
    )


_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_KECCAK_ROT = [
    [0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56], [27, 20, 39, 8, 14],
]


def keccak_f(state):
    """keccak-f[1600] on a 25-element u64 list (x + 5y indexing)."""
    M = (1 << 64) - 1

    def rol(v, r):
        r %= 64
        return ((v << r) | (v >> (64 - r))) & M if r else v

    for rc in _KECCAK_RC:
        c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ rol(c[(x + 1) % 5], 1) for x in range(5)]
        state = [state[i] ^ d[i % 5] for i in range(25)]
        bmat = [0] * 25
        for x in range(5):
            for y in range(5):
                bmat[y + 5 * ((2 * x + 3 * y) % 5)] = rol(state[x + 5 * y], _KECCAK_ROT[x][y])
        state = [
            bmat[i] ^ ((~bmat[(i % 5 + 1) % 5 + 5 * (i // 5)]) & M & bmat[(i % 5 + 2) % 5 + 5 * (i // 5)])
            for i in range(25)
        ]
        state[0] ^= rc
    return state


def _keccak_sponge(ex, input_ptr: int, result_ptr: int):
    """Keccak sponge with 18-u64 general blocks (reference keccak/sponge.rs)."""
    clk0 = ex.clk
    rec_len = ex._mr(result_ptr + 16 * 4, clk0)
    input_len = rec_len.value
    if input_len % 36 != 0:
        raise _err("keccak_sponge: input length must be a multiple of 36 u32s")
    reads = [ex._mr(input_ptr + 4 * i, clk0) for i in range(input_len)]
    words = [r.value for r in reads]
    u64s = [words[2 * i] | (words[2 * i + 1] << 32) for i in range(input_len // 2)]
    state = [0] * 25
    xored_states = []
    for blk in range(0, len(u64s), 18):
        for i in range(18):
            state[i] ^= u64s[blk + i]
        xored_states.append(list(state))
        state = keccak_f(state)
    out_words = []
    for i in range(8):
        out_words.append(state[i] & 0xFFFFFFFF)
        out_words.append((state[i] >> 32) & 0xFFFFFFFF)
    writes = [ex._mw(result_ptr + 4 * i, out_words[i], clk0 + 1) for i in range(16)]
    ex.record.precompile_events.setdefault("keccak_sponge", []).append(
        {"shard": ex.shard, "clk": clk0, "input_ptr": input_ptr, "result_ptr": result_ptr,
         "input_len": input_len, "reads": reads, "len_record": rec_len,
         "writes": writes, "xored_states": xored_states,
         "output": out_words}
    )
