// Self-test for the native host runtime (run via `make test` or ctest).
// The authoritative cross-check against the Python implementation is
// tests/test_native.py; this binary validates internal invariants only.

#include <cstdint>
#include <cstdio>
#include <cstdlib>

using u32 = uint32_t;
using u64 = uint64_t;

extern "C" {
u64 fhe_mul_mod(u64, u64, u64);
u64 fhe_pow_mod(u64, u64, u64);
u64 fhe_mod_inverse(u64, u64);
int fhe_is_prime(u64);
int fhe_find_ntt_primes(u64, int, int, const u64*, int, u64*);
u64 fhe_primitive_root(u64);
u64 fhe_negacyclic_psi(u64, u64);
int fhe_build_ntt_tables(u64, u64, u32*, u32*, u32*, u32*, u32*, u32*);
u64 fhe_montgomery_params(u64, u64*, u64*);
u64 fhe_barrett_mu(u64);
}

static int failures = 0;
#define CHECK(cond) do { \
    if (!(cond)) { ++failures; std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); } \
} while (0)

int main() {
    // primality
    CHECK(fhe_is_prime(2) && fhe_is_prime(65537) && fhe_is_prime(12289));
    CHECK(!fhe_is_prime(1) && !fhe_is_prime(65536) && !fhe_is_prime(3 * 5 * 7));
    CHECK(fhe_is_prime(0xFFFFFFFF00000001ull));  // goldilocks prime

    // prime generation: p ≡ 1 (mod 2n), prime, within (2^29, 2^30)
    const u64 n = 4096;
    u64 ps[4];
    CHECK(fhe_find_ntt_primes(n, 4, 30, nullptr, 0, ps) == 0);
    for (u64 p : ps) {
        CHECK(fhe_is_prime(p));
        CHECK(p % (2 * n) == 1);
        CHECK(p > (1ull << 29) && p < (1ull << 30));
    }
    // exclusion honored
    u64 ps2[1];
    CHECK(fhe_find_ntt_primes(n, 1, 30, ps, 1, ps2) == 0);
    CHECK(ps2[0] != ps[0] && ps2[0] == ps[1]);

    // psi^n == -1 and tables are consistent
    const u64 p = ps[0];
    u64 psi = fhe_negacyclic_psi(n, p);
    CHECK(psi != 0 && fhe_pow_mod(psi, n, p) == p - 1);
    CHECK(fhe_mul_mod(psi, fhe_mod_inverse(psi, p), p) == 1);

    static u32 a[4096], b[4096], c[4096], d[4096];
    u32 n_inv, n_inv_sh;
    CHECK(fhe_build_ntt_tables(n, p, a, b, c, d, &n_inv, &n_inv_sh) == 0);
    CHECK(a[0] == 1 && c[0] == 1);                      // psi^brv(0) = psi^0
    CHECK(a[1] == fhe_pow_mod(psi, n / 2, p));          // brv(1) = n/2
    CHECK(fhe_mul_mod(n_inv, n, p) == 1);
    // Shoup companion: floor(w * 2^32 / p)
    CHECK(b[1] == (u32)((((unsigned __int128)a[1]) << 32) / p));

    // Montgomery params: (-p^-1 mod 2^32) * p ≡ -1 (mod 2^32)
    u64 r2, r1;
    u64 p_neg_inv = fhe_montgomery_params(p, &r2, &r1);
    CHECK((u32)(p_neg_inv * p) == 0xFFFFFFFFu);  // -p^-1 * p ≡ -1 (mod 2^32)
    CHECK(r1 == (u64)(((unsigned __int128)1 << 32) % p));
    CHECK(r2 == (u64)(((unsigned __int128)1 << 64) % p));
    CHECK(fhe_barrett_mu(p) == (u64)(((unsigned __int128)1 << 61) / p));

    if (failures) { std::printf("%d failures\n", failures); return 1; }
    std::printf("test_fhecore: all checks passed\n");
    return 0;
}
