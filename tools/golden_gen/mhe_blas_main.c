/*
 * Golden-fixture generator for the information-filter MHE solvers.
 *
 * ORACLE CHOICE (documented finding): the reference's PANEL MHE solvers
 * d_ric_trf_mhe_if / d_ric_trs_mhe_if (/root/reference/lqcp_solvers/
 * d_ric_sv.c:1298,1629) are NOT buildable in any shipped configuration —
 * d_ric_sv.o is absent from lqcp_solvers/Makefile:33 and the functions
 * call panel-BLAS routines (dtsyrk_dpotrf_lib, dsyrk_dpotrf_dtrinv_lib,
 * dpotrf_diag_lib, dtrsv_t_lib_old) that are declared in include/blas_d.h
 * but DEFINED NOWHERE in the tree.  The only living implementation of the
 * same factorization/solve is the reference's own LAPACK oracle pair
 * d_ric_trf_mhe_if_blas / d_ric_trs_mhe_if_blas
 * (/root/reference/reference_code/d_ric_sv_blas.c:47,175 — the twin the
 * test driver cross-checks against, test_d_ric_mhe.c:837-840), which
 * build_ref.sh un-gates (#if 0 -> #if 1) and links against system LAPACK.
 *
 * Problem data mirrors test_d_ric_mhe.c:320-470 exactly: mass-spring A/G
 * (Ts=0.5), C=[I_ny 0], R=I, Qy=I, L0=I (Up0), r=1, f[j]=j, xp0=0,
 * qq_n = -C' Qy y_n, measurements from mhe_measure.dat when given.
 * Terminal equality D=[I_ndN 0], d[i]=i packed in the A_N/f_N slots.
 *
 * Test oracle only; nothing here ships with the framework.
 *
 * Usage: mhe_blas_main nx nw ny ndN N [mhe_measure.dat] > out.json
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "../../tools/golden_gen/tools_decl.h"

void d_ric_trf_mhe_if_blas(int nx, int nw, int ndN, int N, double **A, double **G, double **Q, double **R, double **AGU, double **Up, double **Ue, double **Ur, double *Ud);
void d_ric_trs_mhe_if_blas(int nx, int nw, int ndN, int N, double **AGU, double **Up, double **Ue, double **Ur, double *Ud, double **q, double **r, double **f, double **xp, double **x, double **w, double **lam, double *work);

static double prnd(int *s)
	{
	*s = (1103515245 * (*s) + 12345) & 0x7fffffff;
	return 2.0 * ((double)(*s) / 2147483647.0) - 1.0;
	}

static void print_vec(const char *name, double *v, int n, int comma)
	{
	printf("\"%s\": [", name);
	for(int i=0; i<n; i++) printf("%.17e%s", v[i], i<n-1?",":"");
	printf("]%s\n", comma?",":"");
	}

static void print_rows(const char *name, double **rows, int nrows, int ncols, int comma)
	{
	printf("\"%s\": [", name);
	for(int n=0; n<nrows; n++)
		{
		printf("[");
		for(int j=0; j<ncols; j++) printf("%.17e%s", rows[n][j], j<ncols-1?",":"");
		printf("]%s", n<nrows-1?",":"");
		}
	printf("]%s\n", comma?",":"");
	}

int main(int argc, char **argv)
	{
	if(argc<6) { fprintf(stderr, "usage: %s nx nw ny ndN N [mhe_measure.dat]\n", argv[0]); return 1; }
	int nx = atoi(argv[1]);
	int nw = atoi(argv[2]);
	int ny = atoi(argv[3]);
	int ndN = atoi(argv[4]);
	int N = atoi(argv[5]);
	int ii, jj, n;
	int seed = 42;

	/* measurements */
	double *yy = calloc((N+1)*ny, sizeof(double));
	if(argc>6)
		{
		FILE *fid = fopen(argv[6], "r");
		if(fid==NULL) { fprintf(stderr, "cannot open %s\n", argv[6]); return 1; }
		int fnx, fnw, fny, fNs, rc;
		rc = fscanf(fid, "%d %d %d %d", &fnx, &fnw, &fny, &fNs);
		if(rc!=4 || fny!=ny || fNs<N+1)
			{ fprintf(stderr, "dat header mismatch (%d %d %d %d)\n", fnx, fnw, fny, fNs); return 1; }
		for(jj=0; jj<ny*fNs; jj++)
			{
			float tmp;
			rc = fscanf(fid, "%e", &tmp);
			if(jj<(N+1)*ny) yy[jj] = (double)tmp;
			}
		fclose(fid);
		}
	else
		{
		for(jj=0; jj<(N+1)*ny; jj++) yy[jj] = 1.5*prnd(&seed);
		}

	/* system: mass-spring ZOH like the reference driver */
	double *A = calloc(nx*nx, sizeof(double));
	double *B = calloc(nx*nw, sizeof(double));
	{
	int pp = nx/2, info = 0;
	double *Ac = calloc(nx*nx, sizeof(double));
	for(ii=0; ii<pp; ii++) Ac[pp+ii + ii*nx] = -2.0;
	for(ii=0; ii<pp-1; ii++) Ac[pp+ii+1 + ii*nx] = 1.0;
	for(ii=1; ii<pp; ii++) Ac[pp+ii-1 + ii*nx] = 1.0;
	for(ii=0; ii<pp; ii++) Ac[ii + (pp+ii)*nx] = 1.0;
	double *Bc = calloc(nx*nw, sizeof(double));
	for(ii=0; ii<nw; ii++) Bc[pp+ii + ii*nx] = 1.0;
	memcpy(A, Ac, nx*nx*sizeof(double));
	for(ii=0; ii<nx*nx; ii++) A[ii] *= 0.5;
	expm(nx, A);
	double *T = calloc(nx*nx, sizeof(double));
	memcpy(T, A, nx*nx*sizeof(double));
	for(ii=0; ii<nx; ii++) T[ii + ii*nx] -= 1.0;
	dgemm_nn_3l(nx, nw, nx, T, nx, Bc, nx, B, nx);
	int *ipiv = malloc(nx*sizeof(int));
	dgesv_3l(nx, nw, Ac, nx, ipiv, B, nx, &info);
	free(ipiv); free(T); free(Ac); free(Bc);
	}

	double *C = calloc(ny*nx, sizeof(double));
	for(jj=0; jj<ny; jj++) C[jj*(ny+1)] = 1.0;
	double *R = calloc(nw*nw, sizeof(double));
	for(jj=0; jj<nw; jj++) R[jj*(nw+1)] = 1.0;
	double *Qy = calloc(ny*ny, sizeof(double));
	for(jj=0; jj<ny; jj++) Qy[jj*(ny+1)] = 1.0;
	double *Qx = calloc(nx*nx, sizeof(double));  /* C' Qy C */
	for(jj=0; jj<ny; jj++) Qx[jj*(nx+1)] = 1.0;
	double *L0 = calloc(nx*nx, sizeof(double));  /* Up0 (upper info factor) */
	for(jj=0; jj<nx; jj++) L0[jj*(nx+1)] = 1.0;
	double *r = calloc(nw, sizeof(double));
	for(jj=0; jj<nw; jj++) r[jj] = 1.0;
	double *f = calloc(nx, sizeof(double));
	for(jj=0; jj<nx; jj++) f[jj] = (double)jj;

	double *D = calloc(ndN>0?ndN*nx:1, sizeof(double));
	for(ii=0; ii<ndN; ii++) D[ii*(ndN+1)] = 1.0;
	double *d = calloc(ndN>0?ndN:1, sizeof(double));
	for(ii=0; ii<ndN; ii++) d[ii] = (double)ii;

	/* per-stage pointer arrays */
	double *hA[N+1], *hG[N], *hQ[N+1], *hR[N], *hAGU[N+1];
	double *hUp[N+1], *hUe[N+1], *hUr[N];
	double *hqq[N+1], *hrr[N], *hff[N+1];
	double *hxp[N+1], *hxe[N+1], *hw[N+1], *hlam[N+1];
	for(n=0; n<N; n++)
		{
		hA[n] = A; hG[n] = B; hQ[n] = Qx; hR[n] = R;
		hAGU[n] = calloc(nx*(nx+nw), sizeof(double));
		hUp[n] = calloc(nx*nx, sizeof(double));
		hUe[n] = calloc(nx*nx, sizeof(double));
		hUr[n] = calloc(nw*nw, sizeof(double));
		hrr[n] = calloc(nw, sizeof(double));
		for(jj=0; jj<nw; jj++) hrr[n][jj] = r[jj];
		}
	hA[N] = D; hQ[N] = Qx;
	hAGU[N] = calloc((ndN>0?ndN:1)*nx, sizeof(double));
	hUp[N] = calloc(nx*nx, sizeof(double));
	hUe[N] = calloc(nx*nx, sizeof(double));
	double *Ud = calloc(ndN>0?ndN*ndN:1, sizeof(double));
	for(n=0; n<=N; n++)
		{
		hqq[n] = calloc(nx, sizeof(double));
		hff[n] = calloc(nx, sizeof(double));
		hxp[n] = calloc(nx, sizeof(double));
		hxe[n] = calloc(nx, sizeof(double));
		hw[n]  = calloc(nw>0?nw:1, sizeof(double));
		hlam[n] = calloc(nx>ndN?nx:ndN, sizeof(double));
		}

	/* qq_n = -C' Qy y_n; C = [I 0], Qy = I -> qq_n = [-y_n; 0] in general
	   computed densely (driver :666-672 math) */
	for(n=0; n<=N; n++)
		for(jj=0; jj<nx; jj++)
			{
			double acc = 0.0;
			for(ii=0; ii<ny; ii++)
				{
				double Cij = C[ii + jj*ny];  /* C(ii, jj) col-major */
				double Qyv = 0.0;
				for(int kk2=0; kk2<ny; kk2++)
					Qyv += Qy[ii + kk2*ny] * yy[n*ny + kk2];
				acc += Cij * (-Qyv);
				}
			hqq[n][jj] = acc;
			}

	for(n=0; n<N; n++)
		for(jj=0; jj<nx; jj++) hff[n][jj] = f[jj];
	for(jj=0; jj<ndN; jj++) hff[N][jj] = d[jj];
	/* xp0 = 0; Up[0] = L0 */
	memcpy(hUp[0], L0, nx*nx*sizeof(double));

	double *work = calloc(nx+nw, sizeof(double));

	d_ric_trf_mhe_if_blas(nx, nw, ndN, N, hA, hG, hQ, hR, hAGU, hUp, hUe, hUr, Ud);
	d_ric_trs_mhe_if_blas(nx, nw, ndN, N, hAGU, hUp, hUe, hUr, Ud, hqq, hrr, hff, hxp, hxe, hw, hlam, work);

	printf("{\n");
	printf("\"config\": {\"nx\": %d, \"nw\": %d, \"ny\": %d, \"ndN\": %d, \"N\": %d},\n", nx, nw, ny, ndN, N);
	print_vec("A_colmajor", A, nx*nx, 1);
	print_vec("G_colmajor", B, nx*nw, 1);
	print_vec("C_colmajor", C, ny*nx, 1);
	print_vec("R_colmajor", R, nw*nw, 1);
	print_vec("Qy_colmajor", Qy, ny*ny, 1);
	print_vec("r", r, nw, 1);
	print_vec("f", f, nx, 1);
	print_vec("D_colmajor", D, ndN>0?ndN*nx:0, 1);
	print_vec("d", d, ndN>0?ndN:0, 1);
	print_vec("yy", yy, (N+1)*ny, 1);
	print_rows("qq", hqq, N+1, nx, 1);
	print_rows("xe", hxe, N+1, nx, 1);
	print_rows("xp", hxp, N+1, nx, 1);
	print_rows("w", hw, N, nw, 1);
	print_rows("lam", hlam, N+1, nx, 0);
	printf("}\n");
	return 0;
	}
