// Native policy runtime for robot deployment.
//
// The reference deploys trained policies to the robot's C++ control loop via
// TorchScript export (legged_gym/utils/helpers.py:188-231 +
// PolicyExporterLSTM). This runtime serves the same purpose without a torch
// dependency: it loads the framework's flat binary policy export
// (.grxpolicy, written by wiki_grx_gym_tpu.utils.helpers.export_policy_bin)
// and evaluates the actor MLP deterministically at control rate.
//
// File format (little endian):
//   magic   uint32 = 0x47525850  ("GRXP")
//   version uint32 = 1
//   n_layers uint32
//   act_id   uint32 (0=elu, 1=relu, 2=tanh)
//   then per layer: in_dim uint32, out_dim uint32,
//                   W float32[in*out] (row-major, in x out), b float32[out]

#pragma once

#include <cstdint>
#include <cstddef>

extern "C" {

typedef struct GrxPolicy GrxPolicy;

// Load a .grxpolicy file; returns NULL on failure.
GrxPolicy* grx_policy_load(const char* path);

// Input / output dimensions.
int grx_policy_input_dim(const GrxPolicy*);
int grx_policy_output_dim(const GrxPolicy*);

// Evaluate the deterministic policy: obs[input_dim] -> act[output_dim].
// Returns 0 on success.
int grx_policy_forward(const GrxPolicy*, const float* obs, float* act);

// Batched evaluation (n stacked observations).
int grx_policy_forward_batch(const GrxPolicy*, const float* obs, float* act, int n);

void grx_policy_free(GrxPolicy*);

}  // extern "C"
