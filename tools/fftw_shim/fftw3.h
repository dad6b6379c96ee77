// Minimal FFTW3 API shim — naive O(N³) DFTs, single+double precision.
//
// Purpose: compile the *reference* BioEM (which links FFTW) in environments
// without FFTW, to generate golden Output_Probabilities values for
// tests/test_golden.py. Only the entry points the reference uses
// (/root/reference/include/defs.h:67-96) are provided. Correct for any size,
// fast enough for the tiny (N≤32) golden configs.
//
// This is original shim code (tools/, not part of the bioem_tpu framework).

#ifndef BIOEM_TPU_FFTW_SHIM_H
#define BIOEM_TPU_FFTW_SHIM_H

#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef double fftw_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;
typedef struct fftw_plan_s *fftw_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0)
#define FFTW_DESTROY_INPUT (1U << 0)
#define FFTW_ESTIMATE (1U << 6)

void *fftwf_malloc(size_t n);
void fftwf_free(void *p);
fftwf_plan fftwf_plan_dft_2d(int n0, int n1, fftwf_complex *in,
                             fftwf_complex *out, int sign, unsigned flags);
fftwf_plan fftwf_plan_dft_r2c_2d(int n0, int n1, float *in, fftwf_complex *out,
                                 unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_2d(int n0, int n1, fftwf_complex *in, float *out,
                                 unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_execute_dft(fftwf_plan p, fftwf_complex *in, fftwf_complex *out);
void fftwf_execute_dft_r2c(fftwf_plan p, float *in, fftwf_complex *out);
void fftwf_execute_dft_c2r(fftwf_plan p, fftwf_complex *in, float *out);
void fftwf_destroy_plan(fftwf_plan p);
void fftwf_cleanup(void);

void *fftw_malloc(size_t n);
void fftw_free(void *p);
fftw_plan fftw_plan_dft_2d(int n0, int n1, fftw_complex *in, fftw_complex *out,
                           int sign, unsigned flags);
fftw_plan fftw_plan_dft_r2c_2d(int n0, int n1, double *in, fftw_complex *out,
                               unsigned flags);
fftw_plan fftw_plan_dft_c2r_2d(int n0, int n1, fftw_complex *in, double *out,
                               unsigned flags);
void fftw_execute(fftw_plan p);
void fftw_execute_dft(fftw_plan p, fftw_complex *in, fftw_complex *out);
void fftw_execute_dft_r2c(fftw_plan p, double *in, fftw_complex *out);
void fftw_execute_dft_c2r(fftw_plan p, fftw_complex *in, double *out);
void fftw_destroy_plan(fftw_plan p);
void fftw_cleanup(void);

#ifdef __cplusplus
}
#endif

#endif  // BIOEM_TPU_FFTW_SHIM_H
