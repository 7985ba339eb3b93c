// See policy_runtime.h. Dependency-free C++17; built by build.sh into
// libgrxpolicy.so and driven from Python via ctypes (deploy/runtime.py) or
// directly from a robot-side control loop.

#include "policy_runtime.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x47525850;

struct Layer {
  uint32_t in_dim = 0;
  uint32_t out_dim = 0;
  std::vector<float> w;  // in x out, row-major
  std::vector<float> b;
};

inline float activate(float x, uint32_t act_id) {
  switch (act_id) {
    case 0:  // elu
      return x > 0.0f ? x : std::expm1(x);
    case 1:  // relu
      return x > 0.0f ? x : 0.0f;
    case 2:  // tanh
      return std::tanh(x);
    default:
      return x;
  }
}

}  // namespace

struct GrxPolicy {
  uint32_t act_id = 0;
  std::vector<Layer> layers;
  mutable std::vector<float> scratch_a, scratch_b;
};

extern "C" {

GrxPolicy* grx_policy_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto fail = [&]() -> GrxPolicy* {
    std::fclose(f);
    return nullptr;
  };

  uint32_t header[4];
  if (std::fread(header, sizeof(uint32_t), 4, f) != 4) return fail();
  if (header[0] != kMagic || header[1] != 1) return fail();

  auto* p = new GrxPolicy();
  p->act_id = header[3];
  p->layers.resize(header[2]);
  size_t max_dim = 0;
  for (auto& layer : p->layers) {
    uint32_t dims[2];
    if (std::fread(dims, sizeof(uint32_t), 2, f) != 2) {
      delete p;
      return fail();
    }
    layer.in_dim = dims[0];
    layer.out_dim = dims[1];
    layer.w.resize(size_t(dims[0]) * dims[1]);
    layer.b.resize(dims[1]);
    if (std::fread(layer.w.data(), sizeof(float), layer.w.size(), f) != layer.w.size() ||
        std::fread(layer.b.data(), sizeof(float), layer.b.size(), f) != layer.b.size()) {
      delete p;
      return fail();
    }
    max_dim = std::max(max_dim, size_t(std::max(dims[0], dims[1])));
  }
  std::fclose(f);
  p->scratch_a.resize(max_dim);
  p->scratch_b.resize(max_dim);
  return p;
}

int grx_policy_input_dim(const GrxPolicy* p) {
  return p && !p->layers.empty() ? int(p->layers.front().in_dim) : -1;
}

int grx_policy_output_dim(const GrxPolicy* p) {
  return p && !p->layers.empty() ? int(p->layers.back().out_dim) : -1;
}

int grx_policy_forward(const GrxPolicy* p, const float* obs, float* act) {
  if (!p || p->layers.empty()) return 1;
  const float* x = obs;
  float* cur = p->scratch_a.data();
  float* nxt = p->scratch_b.data();
  size_t n_layers = p->layers.size();
  for (size_t li = 0; li < n_layers; ++li) {
    const Layer& layer = p->layers[li];
    for (uint32_t o = 0; o < layer.out_dim; ++o) nxt[o] = layer.b[o];
    for (uint32_t i = 0; i < layer.in_dim; ++i) {
      const float xi = x[i];
      const float* wrow = layer.w.data() + size_t(i) * layer.out_dim;
      for (uint32_t o = 0; o < layer.out_dim; ++o) nxt[o] += xi * wrow[o];
    }
    const bool last = (li + 1 == n_layers);
    if (!last) {
      for (uint32_t o = 0; o < layer.out_dim; ++o) nxt[o] = activate(nxt[o], p->act_id);
    }
    std::swap(cur, nxt);
    x = cur;
  }
  std::memcpy(act, x, sizeof(float) * p->layers.back().out_dim);
  return 0;
}

int grx_policy_forward_batch(const GrxPolicy* p, const float* obs, float* act, int n) {
  if (!p || p->layers.empty()) return 1;
  const int in = grx_policy_input_dim(p);
  const int out = grx_policy_output_dim(p);
  for (int k = 0; k < n; ++k) {
    int rc = grx_policy_forward(p, obs + size_t(k) * in, act + size_t(k) * out);
    if (rc) return rc;
  }
  return 0;
}

void grx_policy_free(GrxPolicy* p) { delete p; }

}  // extern "C"
