// hpmpc_tpu native runtime layer: problem packing + workspace queries.
//
// TPU-native counterpart of the reference's C interface layer
// (/root/reference/interfaces/c/fortran_order_interface.c:264-292 packs
// user column-major stage data into panel-major form; here we pack into the
// padded stacked [stage, row, col] layout the JAX solvers consume).  The
// hot path is a single linear sweep per array — called through ctypes from
// hpmpc_tpu.api with a pure-numpy fallback.
//
// All matrices are COLUMN-MAJOR double as in the reference's fortran-order
// API; outputs are C-contiguous padded stacks.

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Pack per-stage dynamics [A_n (nx1 x nx0), B_n (nx1 x nu0), b_n (nx1)]
// into F (N, NZ, NX) rows [B'; A'] at padded offsets, and b (N, NX).
// A, B, b are arrays of pointers to column-major stage data.
void hpmpc_tpu_pack_dynamics(
    int N, const int* nx, const int* nu, int NU, int NX, int NZ,
    const double** A, const double** B, const double** b,
    double* F_out /* N*NZ*NX */, double* b_out /* N*NX */)
{
    std::memset(F_out, 0, sizeof(double) * (size_t)N * NZ * NX);
    std::memset(b_out, 0, sizeof(double) * (size_t)N * NX);
    for (int n = 0; n < N; n++) {
        const int nx0 = nx[n], nu0 = nu[n], nx1 = nx[n + 1];
        double* Fn = F_out + (size_t)n * NZ * NX;
        // B' rows 0..nu0: F[u, x1] = B[x1, u]
        for (int u = 0; u < nu0; u++)
            for (int x = 0; x < nx1; x++)
                Fn[(size_t)u * NX + x] = B[n][x + (size_t)u * nx1];
        // A' rows NU..NU+nx0: F[NU+x0, x1] = A[x1, x0]
        for (int x0 = 0; x0 < nx0; x0++)
            for (int x = 0; x < nx1; x++)
                Fn[(size_t)(NU + x0) * NX + x] = A[n][x + (size_t)x0 * nx1];
        for (int x = 0; x < nx1; x++)
            b_out[(size_t)n * NX + x] = b[n][x];
    }
}

// Pack per-stage cost [R (nu x nu), S (nu x nx), Q (nx x nx), r, q] into
// H (N+1, NZ, NZ) = [[R, S], [S', Q]] at padded offsets and g (N+1, NZ).
void hpmpc_tpu_pack_cost(
    int Np1, const int* nx, const int* nu, int NU, int NZ,
    const double** Q, const double** S, const double** R,
    const double** q, const double** r,
    double* H_out /* Np1*NZ*NZ */, double* g_out /* Np1*NZ */)
{
    std::memset(H_out, 0, sizeof(double) * (size_t)Np1 * NZ * NZ);
    std::memset(g_out, 0, sizeof(double) * (size_t)Np1 * NZ);
    for (int n = 0; n < Np1; n++) {
        const int nx0 = nx[n], nu0 = nu[n];
        double* Hn = H_out + (size_t)n * NZ * NZ;
        double* gn = g_out + (size_t)n * NZ;
        for (int i = 0; i < nu0; i++)
            for (int j = 0; j < nu0; j++)
                Hn[(size_t)i * NZ + j] = R[n][i + (size_t)j * nu0];
        for (int i = 0; i < nx0; i++)
            for (int j = 0; j < nx0; j++)
                Hn[(size_t)(NU + i) * NZ + (NU + j)] = Q[n][i + (size_t)j * nx0];
        // S is (nu x nx): H[u, NU+x] = S[u, x]; symmetric mirror
        for (int u = 0; u < nu0; u++)
            for (int x = 0; x < nx0; x++) {
                double v = S[n][u + (size_t)x * nu0];
                Hn[(size_t)u * NZ + (NU + x)] = v;
                Hn[(size_t)(NU + x) * NZ + u] = v;
            }
        for (int u = 0; u < nu0; u++) gn[u] = r[n][u];
        for (int x = 0; x < nx0; x++) gn[NU + x] = q[n][x];
    }
}

// Pack box constraints: logical idxb ([u;x] indices) -> padded coordinates.
void hpmpc_tpu_pack_bounds(
    int Np1, const int* nx, const int* nu, const int* nb, int NU, int NB,
    const int** idxb, const double** lb, const double** ub,
    int32_t* idxb_out /* Np1*NB */, double* lb_out, double* ub_out)
{
    std::memset(idxb_out, 0, sizeof(int32_t) * (size_t)Np1 * NB);
    std::memset(lb_out, 0, sizeof(double) * (size_t)Np1 * NB);
    std::memset(ub_out, 0, sizeof(double) * (size_t)Np1 * NB);
    for (int n = 0; n < Np1; n++) {
        const int nu0 = nu[n];
        for (int k = 0; k < nb[n]; k++) {
            int j = idxb[n][k];
            idxb_out[(size_t)n * NB + k] =
                j < nu0 ? j : NU + (j - nu0);
            lb_out[(size_t)n * NB + k] = lb[n][k];
            ub_out[(size_t)n * NB + k] = ub[n][k];
        }
    }
}

// Pack general constraints: D (ng x nu), C (ng x nx) -> rows over padded z.
void hpmpc_tpu_pack_general(
    int Np1, const int* nx, const int* nu, const int* ng, int NU, int NG, int NZ,
    const double** C, const double** D,
    const double** lg, const double** ug,
    double* C_out /* Np1*NG*NZ */, double* lg_out, double* ug_out)
{
    std::memset(C_out, 0, sizeof(double) * (size_t)Np1 * NG * NZ);
    std::memset(lg_out, 0, sizeof(double) * (size_t)Np1 * NG);
    std::memset(ug_out, 0, sizeof(double) * (size_t)Np1 * NG);
    for (int n = 0; n < Np1; n++) {
        const int nx0 = nx[n], nu0 = nu[n], ng0 = ng[n];
        double* Cn = C_out + (size_t)n * NG * NZ;
        for (int gi = 0; gi < ng0; gi++) {
            if (D && D[n])
                for (int u = 0; u < nu0; u++)
                    Cn[(size_t)gi * NZ + u] = D[n][gi + (size_t)u * ng0];
            if (C && C[n])
                for (int x = 0; x < nx0; x++)
                    Cn[(size_t)gi * NZ + (NU + x)] = C[n][gi + (size_t)x * ng0];
            lg_out[(size_t)n * NG + gi] = lg[n][gi];
            ug_out[(size_t)n * NG + gi] = ug[n][gi];
        }
    }
}

// Workspace/memory planning query: bytes of device memory one solve of the
// padded problem needs (the reference's work_space_size_bytes idiom,
// include/c_interface.h:40,59-60 — here it sizes the padded problem data +
// IPM state so callers can plan batch sizes against HBM).
int64_t hpmpc_tpu_ip_ocp_hard_tv_work_space_size_bytes(
    int N, const int* nx, const int* nu, const int* nb, const int* ng,
    int k_max, int elem_bytes)
{
    int NXm = 0, NUm = 0, NBm = 1, NGm = 1;
    for (int i = 0; i <= N; i++) {
        if (nx[i] > NXm) NXm = nx[i];
        if (nu[i] > NUm) NUm = nu[i];
        if (nb[i] > NBm) NBm = nb[i];
        if (ng[i] > NGm) NGm = ng[i];
    }
    const int64_t NZ = NXm + NUm;
    int64_t elems = 0;
    // problem data: F, b, H, g, bounds, general rows, masks
    elems += (int64_t)N * NZ * NXm + (int64_t)N * NXm;
    elems += (int64_t)(N + 1) * (NZ * NZ + NZ);
    elems += (int64_t)(N + 1) * (3 * NBm + 3 * NGm + NGm * NZ);
    elems += (int64_t)(N + 1) * (NZ + NXm + NBm + NGm);  // masks
    // IPM state: iterates + slacks/multipliers (2 copies for the loop),
    // factor L, stat
    elems += 2 * ((int64_t)(N + 1) * NZ + (int64_t)N * NXm
                  + 4 * (int64_t)(N + 1) * (NBm + NGm));
    elems += (int64_t)(N + 1) * NZ * NZ;  // retained factor
    elems += (int64_t)k_max * 5;
    return elems * elem_bytes;
}

}  // extern "C"
