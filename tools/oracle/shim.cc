// extern-C shim over the reference library (built out-of-tree at
// /tmp/ref_build) so the conformance-golden generator can call it through
// ctypes.  This file is original glue code: it only forwards arguments to
// the reference's public API (FieldCalculations.h:113-304) and converts
// std::string / std::vector / ValuesDefined& to C-ABI types.  It is used
// exclusively for generating test goldens (tests/goldens/), never linked
// into the shipped framework.
//
// Build (see tools/oracle/build.sh):
//   g++ -O2 -fPIC -shared shim.cc -I/root/reference/src
//       -L/tmp/ref_build/src/mi_fieldcalc -lmi-fieldcalc -o liboracle.so

#include <mi_fieldcalc/FieldCalculations.h>
#include <mi_fieldcalc/FieldDefined.h>

#include <string>
#include <vector>

using miutil::ValuesDefined;
namespace fc = miutil::fieldcalc;

namespace {
ValuesDefined vd(int d) { return static_cast<ValuesDefined>(d); }
}  // namespace

extern "C" {

// ---- level ops -----------------------------------------------------------
int o_pleveltemp(int nx, int ny, const float* t, float p, const char* unit,
                 int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::pleveltemp(nx, ny, t, p, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelthe(int nx, int ny, const float* t, const float* rh, float p,
                int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelthe(nx, ny, t, rh, p, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelhum(int nx, int ny, const float* t, const float* hum, float p,
                const char* unit, int compute, float* out, int* fd,
                float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelhum(nx, ny, t, hum, p, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_pleveldz2tmean(int nx, int ny, const float* z1, const float* z2,
                     float p1, float p2, int compute, float* out, int* fd,
                     float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::pleveldz2tmean(nx, ny, z1, z2, p1, p2, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelducting(int nx, int ny, const float* t, const float* h, float p,
                    int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelducting(nx, ny, t, h, p, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_hleveltemp(int nx, int ny, const float* t, const float* ps, float al,
                 float bl, const char* unit, int compute, float* out, int* fd,
                 float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::hleveltemp(nx, ny, t, ps, al, bl, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_hlevelthe(int nx, int ny, const float* t, const float* q,
                const float* ps, float al, float bl, int compute, float* out,
                int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::hlevelthe(nx, ny, t, q, ps, al, bl, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_hlevelhum(int nx, int ny, const float* t, const float* hum,
                const float* ps, float al, float bl, const char* unit,
                int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok =
      fc::hlevelhum(nx, ny, t, hum, ps, al, bl, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_hlevelducting(int nx, int ny, const float* t, const float* h,
                    const float* ps, float al, float bl, int compute,
                    float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::hlevelducting(nx, ny, t, h, ps, al, bl, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_hlevelpressure(int nx, int ny, const float* ps, float al, float bl,
                     float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::hlevelpressure(nx, ny, ps, al, bl, out, d, undef);
  *fd = d;
  return ok;
}

int o_aleveltemp(int nx, int ny, const float* t, const float* p,
                 const char* unit, int compute, float* out, int* fd,
                 float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::aleveltemp(nx, ny, t, p, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_alevelthe(int nx, int ny, const float* t, const float* q, const float* p,
                int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::alevelthe(nx, ny, t, q, p, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_alevelhum(int nx, int ny, const float* t, const float* hum,
                const float* p, const char* unit, int compute, float* out,
                int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::alevelhum(nx, ny, t, hum, p, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_alevelducting(int nx, int ny, const float* t, const float* h,
                    const float* p, int compute, float* out, int* fd,
                    float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::alevelducting(nx, ny, t, h, p, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_ilevelgwind(int nx, int ny, const float* mpot, const float* xm,
                  const float* ym, const float* fcor, float* ug, float* vg,
                  int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::ilevelgwind(nx, ny, mpot, xm, ym, fcor, ug, vg, d, undef);
  *fd = d;
  return ok;
}

int o_seaSoundSpeed(int nx, int ny, const float* t, const float* s, float z,
                    int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::seaSoundSpeed(nx, ny, t, s, z, compute, out, d, undef);
  *fd = d;
  return ok;
}

// ---- stability indices ---------------------------------------------------
int o_kIndex(int nx, int ny, const float* t500, const float* t700,
             const float* rh700, const float* t850, const float* rh850,
             float p500, float p700, float p850, int compute, float* out,
             int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::kIndex(nx, ny, t500, t700, rh700, t850, rh850, p500, p700,
                       p850, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_ductingIndex(int nx, int ny, const float* t850, const float* rh850,
                   float p850, int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::ductingIndex(nx, ny, t850, rh850, p850, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_showalterIndex(int nx, int ny, const float* t500, const float* t850,
                     const float* rh850, float p500, float p850, int compute,
                     float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::showalterIndex(nx, ny, t500, t850, rh850, p500, p850, compute,
                               out, d, undef);
  *fd = d;
  return ok;
}

int o_boydenIndex(int nx, int ny, const float* t700, const float* z700,
                  const float* z1000, float p700, float p1000, int compute,
                  float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::boydenIndex(nx, ny, t700, z700, z1000, p700, p1000, compute,
                            out, d, undef);
  *fd = d;
  return ok;
}

int o_sweatIndex(int nx, int ny, const float* t850, const float* t500,
                 const float* td850, const float* td500, const float* u850,
                 const float* v850, const float* u500, const float* v500,
                 float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::sweatIndex(nx, ny, t850, t500, td850, td500, u850, v850, u500,
                           v500, out, d, undef);
  *fd = d;
  return ok;
}

// ---- elementwise ---------------------------------------------------------
int o_cvtemp(int nx, int ny, const float* t, int compute, float* out, int* fd,
             float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::cvtemp(nx, ny, t, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_cvhum(int nx, int ny, const float* t, const float* hum, const char* unit,
            int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::cvhum(nx, ny, t, hum, unit, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_abshum(int nx, int ny, const float* t, const float* rh, float* out,
             int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::abshum(nx, ny, t, rh, out, d, undef);
  *fd = d;
  return ok;
}

int o_vectorabs(int nx, int ny, const float* u, const float* v, float* out,
                int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::vectorabs(nx, ny, u, v, out, d, undef);
  *fd = d;
  return ok;
}

int o_windCooling(int nx, int ny, const float* t, const float* u,
                  const float* v, int compute, float* out, int* fd,
                  float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::windCooling(nx, ny, t, u, v, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_underCooledRain(int nx, int ny, const float* precip, const float* snow,
                      const float* tk, float precipMin, float snowRateMax,
                      float tcMax, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::underCooledRain(nx, ny, precip, snow, tk, precipMin,
                                snowRateMax, tcMax, out, d, undef);
  *fd = d;
  return ok;
}

int o_pressure2FlightLevel(int nx, int ny, const float* p, float* out, int* fd,
                           float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::pressure2FlightLevel(nx, ny, p, out, d, undef);
  *fd = d;
  return ok;
}

int o_snow_in_cm(int nx, int ny, const float* sw, const float* tk2m,
                 const float* td2m, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::snow_in_cm(nx, ny, sw, tk2m, td2m, out, d, undef);
  *fd = d;
  return ok;
}

int o_values2classes(int nx, int ny, const float* f, float* out,
                     const float* values, int nvalues, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  std::vector<float> vals(values, values + nvalues);
  bool ok = fc::values2classes(nx, ny, f, out, vals, d, undef);
  *fd = d;
  return ok;
}

int o_fieldOPERfield(int compute, int nx, int ny, const float* f1,
                     const float* f2, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::fieldOPERfield(compute, nx, ny, f1, f2, out, d, undef);
  *fd = d;
  return ok;
}

int o_fieldOPERconstant(int compute, int nx, int ny, const float* f,
                        float value, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::fieldOPERconstant(compute, nx, ny, f, value, out, d, undef);
  *fd = d;
  return ok;
}

int o_constantOPERfield(int compute, int nx, int ny, float value,
                        const float* f, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::constantOPERfield(compute, nx, ny, value, f, out, d, undef);
  *fd = d;
  return ok;
}

// ---- stencils ------------------------------------------------------------
int o_plevelgwind_xcomp(int nx, int ny, const float* z, const float* xm,
                        const float* ym, const float* fcor, float* out,
                        int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelgwind_xcomp(nx, ny, z, xm, ym, fcor, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelgwind_ycomp(int nx, int ny, const float* z, const float* xm,
                        const float* ym, const float* fcor, float* out,
                        int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelgwind_ycomp(nx, ny, z, xm, ym, fcor, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelgvort(int nx, int ny, const float* z, const float* xm,
                  const float* ym, const float* fcor, float* out, int* fd,
                  float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::plevelgvort(nx, ny, z, xm, ym, fcor, out, d, undef);
  *fd = d;
  return ok;
}

int o_plevelqvector(int nx, int ny, const float* z, const float* t,
                    const float* xm, const float* ym, const float* fcor,
                    float p, int compute, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok =
      fc::plevelqvector(nx, ny, z, t, xm, ym, fcor, p, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_relvort(int nx, int ny, const float* u, const float* v, const float* xm,
              const float* ym, float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::relvort(nx, ny, u, v, xm, ym, out, d, undef);
  *fd = d;
  return ok;
}

int o_absvort(int nx, int ny, const float* u, const float* v, const float* xm,
              const float* ym, const float* fcor, float* out, int* fd,
              float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::absvort(nx, ny, u, v, xm, ym, fcor, out, d, undef);
  *fd = d;
  return ok;
}

int o_divergence(int nx, int ny, const float* u, const float* v,
                 const float* xm, const float* ym, float* out, int* fd,
                 float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::divergence(nx, ny, u, v, xm, ym, out, d, undef);
  *fd = d;
  return ok;
}

int o_advection(int nx, int ny, const float* f, const float* u, const float* v,
                const float* xm, const float* ym, float hours, float* out,
                int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::advection(nx, ny, f, u, v, xm, ym, hours, out, d, undef);
  *fd = d;
  return ok;
}

int o_gradient(int nx, int ny, const float* f, const float* xm,
               const float* ym, int compute, float* out, int* fd,
               float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::gradient(nx, ny, f, xm, ym, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_shapiro2_filter(int nx, int ny, float* f, float* out, int* fd,
                      float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::shapiro2_filter(nx, ny, f, out, d, undef);
  *fd = d;
  return ok;
}

int o_thermalFrontParameter(int nx, int ny, const float* t, const float* xm,
                            const float* ym, float* out, int* fd,
                            float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::thermalFrontParameter(nx, ny, t, xm, ym, out, d, undef);
  *fd = d;
  return ok;
}

int o_momentumXcoordinate(int nx, int ny, const float* v, const float* xm,
                          const float* fcor, float fcorMin, float* out,
                          int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok =
      fc::momentumXcoordinate(nx, ny, v, xm, fcor, fcorMin, out, d, undef);
  *fd = d;
  return ok;
}

int o_momentumYcoordinate(int nx, int ny, const float* u, const float* ym,
                          const float* fcor, float fcorMin, float* out,
                          int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok =
      fc::momentumYcoordinate(nx, ny, u, ym, fcor, fcorMin, out, d, undef);
  *fd = d;
  return ok;
}

int o_jacobian(int nx, int ny, const float* f1, const float* f2,
               const float* xm, const float* ym, float* out, int* fd,
               float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::jacobian(nx, ny, f1, f2, xm, ym, out, d, undef);
  *fd = d;
  return ok;
}

// ---- ensemble / window ---------------------------------------------------
int o_sumFields(int nx, int ny, const float* members, int nmem, float* out,
                int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  std::vector<float*> fields;
  for (int j = 0; j < nmem; ++j)
    fields.push_back(const_cast<float*>(members) + (size_t)j * nx * ny);
  bool ok = fc::sumFields(nx, ny, fields, out, d, undef);
  *fd = d;
  return ok;
}

int o_meanValue(int nx, int ny, const float* members, const int* fdin,
                int nmem, float* out, int* fd, float undef) {
  std::vector<float*> fields;
  std::vector<ValuesDefined> din;
  for (int j = 0; j < nmem; ++j) {
    fields.push_back(const_cast<float*>(members) + (size_t)j * nx * ny);
    din.push_back(vd(fdin[j]));
  }
  ValuesDefined d = vd(*fd);
  bool ok = fc::meanValue(nx, ny, fields, din, out, d, undef);
  *fd = d;
  return ok;
}

int o_stddevValue(int nx, int ny, const float* members, const int* fdin,
                  int nmem, float* out, int* fd, float undef) {
  std::vector<float*> fields;
  std::vector<ValuesDefined> din;
  for (int j = 0; j < nmem; ++j) {
    fields.push_back(const_cast<float*>(members) + (size_t)j * nx * ny);
    din.push_back(vd(fdin[j]));
  }
  ValuesDefined d = vd(*fd);
  bool ok = fc::stddevValue(nx, ny, fields, din, out, d, undef);
  *fd = d;
  return ok;
}

int o_extremeValue(int compute, int nx, int ny, const float* members, int nmem,
                   float* out, int* fd, float undef) {
  std::vector<float*> fields;
  for (int j = 0; j < nmem; ++j)
    fields.push_back(const_cast<float*>(members) + (size_t)j * nx * ny);
  ValuesDefined d = vd(*fd);
  bool ok = fc::extremeValue(compute, nx, ny, fields, out, d, undef);
  *fd = d;
  return ok;
}

int o_probability(int compute, int nx, int ny, const float* members,
                  const int* fdin, int nmem, const float* limits, int nlimits,
                  float* out, int* fd, float undef) {
  std::vector<float*> fields;
  std::vector<ValuesDefined> din;
  for (int j = 0; j < nmem; ++j) {
    fields.push_back(const_cast<float*>(members) + (size_t)j * nx * ny);
    din.push_back(vd(fdin[j]));
  }
  std::vector<float> lim(limits, limits + nlimits);
  ValuesDefined d = vd(*fd);
  bool ok = fc::probability(compute, nx, ny, fields, din, lim, out, d, undef);
  *fd = d;
  return ok;
}

int o_neighbourProbFunctions(int nx, int ny, const float* f,
                             const float* constants, int nconst, int compute,
                             float* out, int* fd, float undef) {
  std::vector<float> cst(constants, constants + nconst);
  ValuesDefined d = vd(*fd);
  bool ok = fc::neighbourProbFunctions(nx, ny, f, cst, compute, out, d, undef);
  *fd = d;
  return ok;
}

int o_neighbourFunctions(int nx, int ny, const float* f,
                         const float* constants, int nconst, int compute,
                         float* out, int* fd, float undef) {
  std::vector<float> cst(constants, constants + nconst);
  ValuesDefined d = vd(*fd);
  bool ok = fc::neighbourFunctions(nx, ny, f, cst, compute, out, d, undef);
  *fd = d;
  return ok;
}

// ---- vessel icing --------------------------------------------------------
int o_vesselIcingOverland(int nx, int ny, const float* airtemp,
                          const float* seatemp, const float* u, const float* v,
                          const float* sal, const float* aice, float* out,
                          int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::vesselIcingOverland(nx, ny, airtemp, seatemp, u, v, sal, aice,
                                    out, d, undef);
  *fd = d;
  return ok;
}

int o_vesselIcingMertins(int nx, int ny, const float* airtemp,
                         const float* seatemp, const float* u, const float* v,
                         const float* sal, const float* aice, float* out,
                         int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::vesselIcingMertins(nx, ny, airtemp, seatemp, u, v, sal, aice,
                                   out, d, undef);
  *fd = d;
  return ok;
}

int o_vesselIcingModStall(int nx, int ny, const float* sal, const float* wave,
                          const float* xw, const float* yw, const float* at,
                          const float* rh, const float* sst, const float* p,
                          const float* pw, const float* aice,
                          const float* depth, float vs, float alpha,
                          float zmin, float zmax, float* out, int* fd,
                          float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::vesselIcingModStall(nx, ny, sal, wave, xw, yw, at, rh, sst, p,
                                    pw, aice, depth, vs, alpha, zmin, zmax,
                                    out, d, undef);
  *fd = d;
  return ok;
}

int o_vesselIcingMincog(int nx, int ny, const float* sal, const float* wave,
                        const float* xw, const float* yw, const float* at,
                        const float* rh, const float* sst, const float* p,
                        const float* pw, const float* aice, const float* depth,
                        float vs, float alpha, float zmin, float zmax, int alt,
                        float* out, int* fd, float undef) {
  ValuesDefined d = vd(*fd);
  bool ok = fc::vesselIcingMincog(nx, ny, sal, wave, xw, yw, at, rh, sst, p,
                                  pw, aice, depth, vs, alpha, zmin, zmax, alt,
                                  out, d, undef);
  *fd = d;
  return ok;
}


// ---- simple unary/binary field ops (FieldCalculations.cc:2501-2608) ------

#define O_UNARY(NAME)                                                         \
  int o_##NAME(int nx, int ny, const float* f, float* out, int* fd,           \
               float undef) {                                                 \
    ValuesDefined d = vd(*fd);                                                \
    fc::NAME(nx, ny, f, out, d, undef);                                       \
    *fd = d;                                                                  \
    return 1;                                                                 \
  }

O_UNARY(absvalueField)
O_UNARY(log10Field)
O_UNARY(pow10Field)
O_UNARY(logField)
O_UNARY(expField)

#define O_UNARY_CONST(NAME)                                                   \
  int o_##NAME(int nx, int ny, const float* f, float value, float* out,       \
               int* fd, float undef) {                                        \
    ValuesDefined d = vd(*fd);                                                \
    fc::NAME(nx, ny, f, value, out, d, undef);                                \
    *fd = d;                                                                  \
    return 1;                                                                 \
  }

O_UNARY_CONST(powerField)
O_UNARY_CONST(replaceUndefined)
O_UNARY_CONST(replaceDefined)
O_UNARY_CONST(minvalueFieldConst)
O_UNARY_CONST(maxvalueFieldConst)

#define O_BINARY(NAME)                                                        \
  int o_##NAME(int nx, int ny, const float* f1, const float* f2, float* out,  \
               int* fd, float undef) {                                        \
    ValuesDefined d = vd(*fd);                                                \
    fc::NAME(nx, ny, f1, f2, out, d, undef);                                  \
    *fd = d;                                                                  \
    return 1;                                                                 \
  }

O_BINARY(minvalueFields)
O_BINARY(maxvalueFields)

int o_copy_field(int nx, int ny, const float* f, float* out, int* fd,
                 float undef) {
  (void)fd; (void)undef;
  fc::copy_field(out, f, (size_t)nx * (size_t)ny);
  return 1;
}

}  // extern "C"
