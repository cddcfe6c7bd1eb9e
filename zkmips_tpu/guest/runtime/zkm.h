/* zkMIPS guest runtime: syscall stubs + io helpers.
 *
 * The C analog of the reference's Rust entrypoint crate
 * (crates/zkvm/entrypoint/src/lib.rs:125, src/syscalls/): a guest built
 * against this header + crt0.S + zkm.ld runs under the zkmips_tpu executor
 * and prover.  Cross-compile with a mipsel bare-metal toolchain:
 *
 *   mipsel-linux-gnu-gcc -nostdlib -static -mno-abicalls -fno-pic \
 *     -T zkm.ld crt0.S guest.c -o guest.elf
 */
#ifndef ZKM_H
#define ZKM_H

#include <stdint.h>
#include <stddef.h>

/* syscall ids (executor/opcodes.py SyscallCode; reference
 * crates/core/executor/src/syscalls/code.rs) */
#define ZKM_SYS_HALT 0x00000000u
#define ZKM_SYS_WRITE 0x00000002u
#define ZKM_SYS_ENTER_UNCONSTRAINED 0x00000003u
#define ZKM_SYS_EXIT_UNCONSTRAINED 0x00000004u
#define ZKM_SYS_SHA_EXTEND 0x30010005u
#define ZKM_SYS_SHA_COMPRESS 0x01010006u
#define ZKM_SYS_KECCAK_SPONGE 0x01010009u
#define ZKM_SYS_COMMIT 0x00000010u
#define ZKM_SYS_COMMIT_DEFERRED_PROOFS 0x0000001Au
#define ZKM_SYS_VERIFY_ZKM_PROOF 0x0000001Bu
#define ZKM_SYS_HINT_LEN 0x000000F0u
#define ZKM_SYS_HINT_READ 0x000000F1u
#define ZKM_SYS_POSEIDON2_PERMUTE 0x00300111u

/* file descriptors (executor/syscalls.py) */
#define ZKM_FD_STDOUT 1
#define ZKM_FD_STDERR 2
#define ZKM_FD_PUBLIC_VALUES 3
#define ZKM_FD_HINT 4

static inline uint32_t zkm_syscall3(uint32_t id, uint32_t a0, uint32_t a1,
                                    uint32_t a2) {
  register uint32_t v0 __asm__("$2") = id;
  register uint32_t r4 __asm__("$4") = a0;
  register uint32_t r5 __asm__("$5") = a1;
  register uint32_t r6 __asm__("$6") = a2;
  __asm__ volatile("syscall"
                   : "+r"(v0)
                   : "r"(r4), "r"(r5), "r"(r6)
                   : "memory");
  return v0;
}

static inline void zkm_halt(uint32_t exit_code) {
  zkm_syscall3(ZKM_SYS_HALT, exit_code, 0, 0);
  __builtin_unreachable();
}

/* write nbytes from buf to fd (fd 3 = public values stream) */
static inline void zkm_write(uint32_t fd, const void *buf, uint32_t nbytes) {
  zkm_syscall3(ZKM_SYS_WRITE, fd, (uint32_t)(uintptr_t)buf, nbytes);
}

/* commit one 32-bit word of the committed-value digest (index 0..7) */
static inline void zkm_commit(uint32_t index, uint32_t word) {
  zkm_syscall3(ZKM_SYS_COMMIT, index, word, 0);
}

/* commit one word of the deferred-proofs digest (index 0..7) */
static inline void zkm_commit_deferred(uint32_t index, uint32_t word) {
  zkm_syscall3(ZKM_SYS_COMMIT_DEFERRED_PROOFS, index, word, 0);
}

/* verify a deferred proof: vkey/pv digests are 8-word arrays */
static inline void zkm_verify_proof(const uint32_t vkey[8],
                                    const uint32_t pv_digest[8]) {
  zkm_syscall3(ZKM_SYS_VERIFY_ZKM_PROOF, (uint32_t)(uintptr_t)vkey,
               (uint32_t)(uintptr_t)pv_digest, 0);
}

/* host input stream: length of the next hint, then read it into buf
 * (buf must be word-aligned; len bytes are rounded up to words) */
static inline uint32_t zkm_hint_len(void) {
  return zkm_syscall3(ZKM_SYS_HINT_LEN, 0, 0, 0);
}

static inline void zkm_hint_read(void *buf, uint32_t len) {
  zkm_syscall3(ZKM_SYS_HINT_READ, (uint32_t)(uintptr_t)buf, len);
}

/* unconstrained (hint-generation) block: everything between enter/exit is
 * rolled back and invisible to the proof */
static inline uint32_t zkm_enter_unconstrained(void) {
  return zkm_syscall3(ZKM_SYS_ENTER_UNCONSTRAINED, 0, 0, 0);
}

static inline void zkm_exit_unconstrained(void) {
  zkm_syscall3(ZKM_SYS_EXIT_UNCONSTRAINED, 0, 0, 0);
}

#endif /* ZKM_H */
