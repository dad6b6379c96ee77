// Naive-DFT implementation of the FFTW subset in fftw3.h (see header).
// Double-precision accumulation throughout, FFTW sign/normalisation
// conventions (unnormalised transforms; r2c keeps n1/2+1 columns).

#include "fftw3.h"

#include <cmath>
#include <cstring>
#include <vector>

namespace {

enum Kind { C2C, R2C, C2R };

struct PlanImpl {
  int n0, n1, sign;
  Kind kind;
  void *in, *out;
};

// 1-D DFT of each row of a complex matrix (rows × n), then of each column.
// Separable evaluation keeps this O(n0·n1·(n0+n1)).
void dft_2d(int n0, int n1, int sign, const double* re_in, const double* im_in,
            double* re_out, double* im_out) {
  std::vector<double> tr(n0 * n1), ti(n0 * n1);
  // Rows: length n1.
  for (int r = 0; r < n0; ++r) {
    for (int k = 0; k < n1; ++k) {
      double sr = 0.0, si = 0.0;
      for (int n = 0; n < n1; ++n) {
        double ang = sign * 2.0 * M_PI * k * n / n1;
        double c = std::cos(ang), s = std::sin(ang);
        double xr = re_in[r * n1 + n], xi = im_in[r * n1 + n];
        sr += xr * c - xi * s;
        si += xr * s + xi * c;
      }
      tr[r * n1 + k] = sr;
      ti[r * n1 + k] = si;
    }
  }
  // Columns: length n0.
  for (int c = 0; c < n1; ++c) {
    for (int k = 0; k < n0; ++k) {
      double sr = 0.0, si = 0.0;
      for (int n = 0; n < n0; ++n) {
        double ang = sign * 2.0 * M_PI * k * n / n0;
        double cc = std::cos(ang), ss = std::sin(ang);
        double xr = tr[n * n1 + c], xi = ti[n * n1 + c];
        sr += xr * cc - xi * ss;
        si += xr * ss + xi * cc;
      }
      re_out[k * n1 + c] = sr;
      im_out[k * n1 + c] = si;
    }
  }
}

template <typename Cpx, typename Real>
void exec_c2c(const PlanImpl* p, Cpx* in, Cpx* out) {
  int n0 = p->n0, n1 = p->n1;
  std::vector<double> re(n0 * n1), im(n0 * n1), ro(n0 * n1), io(n0 * n1);
  for (int i = 0; i < n0 * n1; ++i) {
    re[i] = in[i][0];
    im[i] = in[i][1];
  }
  dft_2d(n0, n1, p->sign, re.data(), im.data(), ro.data(), io.data());
  for (int i = 0; i < n0 * n1; ++i) {
    out[i][0] = static_cast<Real>(ro[i]);
    out[i][1] = static_cast<Real>(io[i]);
  }
}

template <typename Cpx, typename Real>
void exec_r2c(const PlanImpl* p, Real* in, Cpx* out) {
  int n0 = p->n0, n1 = p->n1, nf = n1 / 2 + 1;
  std::vector<double> re(n0 * n1, 0.0), im(n0 * n1, 0.0), ro(n0 * n1), io(n0 * n1);
  for (int i = 0; i < n0 * n1; ++i) re[i] = in[i];
  dft_2d(n0, n1, FFTW_FORWARD, re.data(), im.data(), ro.data(), io.data());
  for (int r = 0; r < n0; ++r)
    for (int c = 0; c < nf; ++c) {
      out[r * nf + c][0] = static_cast<Real>(ro[r * n1 + c]);
      out[r * nf + c][1] = static_cast<Real>(io[r * n1 + c]);
    }
}

template <typename Cpx, typename Real>
void exec_c2r(const PlanImpl* p, Cpx* in, Real* out) {
  int n0 = p->n0, n1 = p->n1, nf = n1 / 2 + 1;
  // Reconstruct the full Hermitian spectrum, then inverse DFT.
  std::vector<double> re(n0 * n1), im(n0 * n1), ro(n0 * n1), io(n0 * n1);
  for (int r = 0; r < n0; ++r)
    for (int c = 0; c < n1; ++c) {
      if (c < nf) {
        re[r * n1 + c] = in[r * nf + c][0];
        im[r * n1 + c] = in[r * nf + c][1];
      } else {
        int rr = (n0 - r) % n0, cc = n1 - c;
        re[r * n1 + c] = in[rr * nf + cc][0];
        im[r * n1 + c] = -in[rr * nf + cc][1];
      }
    }
  dft_2d(n0, n1, FFTW_BACKWARD, re.data(), im.data(), ro.data(), io.data());
  for (int i = 0; i < n0 * n1; ++i) out[i] = static_cast<Real>(ro[i]);
}

PlanImpl* make_plan(int n0, int n1, int sign, Kind kind, void* in, void* out) {
  PlanImpl* p = new PlanImpl;
  p->n0 = n0;
  p->n1 = n1;
  p->sign = sign;
  p->kind = kind;
  p->in = in;
  p->out = out;
  return p;
}

}  // namespace

extern "C" {

// ---- single precision ----
void* fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void* p) { free(p); }
fftwf_plan fftwf_plan_dft_2d(int n0, int n1, fftwf_complex* in,
                             fftwf_complex* out, int sign, unsigned) {
  return reinterpret_cast<fftwf_plan>(make_plan(n0, n1, sign, C2C, in, out));
}
fftwf_plan fftwf_plan_dft_r2c_2d(int n0, int n1, float* in, fftwf_complex* out,
                                 unsigned) {
  return reinterpret_cast<fftwf_plan>(make_plan(n0, n1, -1, R2C, in, out));
}
fftwf_plan fftwf_plan_dft_c2r_2d(int n0, int n1, fftwf_complex* in, float* out,
                                 unsigned) {
  return reinterpret_cast<fftwf_plan>(make_plan(n0, n1, +1, C2R, in, out));
}
void fftwf_execute_dft(fftwf_plan plan, fftwf_complex* in, fftwf_complex* out) {
  exec_c2c<fftwf_complex, float>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftwf_execute_dft_r2c(fftwf_plan plan, float* in, fftwf_complex* out) {
  exec_r2c<fftwf_complex, float>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftwf_execute_dft_c2r(fftwf_plan plan, fftwf_complex* in, float* out) {
  exec_c2r<fftwf_complex, float>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftwf_execute(fftwf_plan plan) {
  PlanImpl* p = reinterpret_cast<PlanImpl*>(plan);
  switch (p->kind) {
    case C2C:
      fftwf_execute_dft(plan, static_cast<fftwf_complex*>(p->in),
                        static_cast<fftwf_complex*>(p->out));
      break;
    case R2C:
      fftwf_execute_dft_r2c(plan, static_cast<float*>(p->in),
                            static_cast<fftwf_complex*>(p->out));
      break;
    case C2R:
      fftwf_execute_dft_c2r(plan, static_cast<fftwf_complex*>(p->in),
                            static_cast<float*>(p->out));
      break;
  }
}
void fftwf_destroy_plan(fftwf_plan plan) {
  delete reinterpret_cast<PlanImpl*>(plan);
}
void fftwf_cleanup(void) {}

// ---- double precision ----
void* fftw_malloc(size_t n) { return malloc(n); }
void fftw_free(void* p) { free(p); }
fftw_plan fftw_plan_dft_2d(int n0, int n1, fftw_complex* in, fftw_complex* out,
                           int sign, unsigned) {
  return reinterpret_cast<fftw_plan>(make_plan(n0, n1, sign, C2C, in, out));
}
fftw_plan fftw_plan_dft_r2c_2d(int n0, int n1, double* in, fftw_complex* out,
                               unsigned) {
  return reinterpret_cast<fftw_plan>(make_plan(n0, n1, -1, R2C, in, out));
}
fftw_plan fftw_plan_dft_c2r_2d(int n0, int n1, fftw_complex* in, double* out,
                               unsigned) {
  return reinterpret_cast<fftw_plan>(make_plan(n0, n1, +1, C2R, in, out));
}
void fftw_execute_dft(fftw_plan plan, fftw_complex* in, fftw_complex* out) {
  exec_c2c<fftw_complex, double>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftw_execute_dft_r2c(fftw_plan plan, double* in, fftw_complex* out) {
  exec_r2c<fftw_complex, double>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftw_execute_dft_c2r(fftw_plan plan, fftw_complex* in, double* out) {
  exec_c2r<fftw_complex, double>(reinterpret_cast<PlanImpl*>(plan), in, out);
}
void fftw_execute(fftw_plan plan) {
  PlanImpl* p = reinterpret_cast<PlanImpl*>(plan);
  switch (p->kind) {
    case C2C:
      fftw_execute_dft(plan, static_cast<fftw_complex*>(p->in),
                       static_cast<fftw_complex*>(p->out));
      break;
    case R2C:
      fftw_execute_dft_r2c(plan, static_cast<double*>(p->in),
                           static_cast<fftw_complex*>(p->out));
      break;
    case C2R:
      fftw_execute_dft_c2r(plan, static_cast<fftw_complex*>(p->in),
                           static_cast<double*>(p->out));
      break;
  }
}
void fftw_destroy_plan(fftw_plan plan) {
  delete reinterpret_cast<PlanImpl*>(plan);
}
void fftw_cleanup(void) {}

}  // extern "C"
