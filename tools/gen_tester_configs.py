"""Generate the remaining tester-config matrix.

For every reference tester yaml without a counterpart here, re-author one:
start from our nearest canonical template (conf/tester/*.yaml, already
re-derived in round 1) and transplant ONLY the scientifically meaningful
hyperparameters from the reference file (xi, start_sigma, schedules, filter
definitions, optimization constants, mode lists...).  Cluster-specific paths,
callables and checkpoints stay ours.  Values ARE the experiment spec — the
file structure and commentary are not copied.

Skipped as stale/dead in the reference itself:
  * blind_bwe_backup.yaml (a backup copy)
  * blind_bwe_langevin.yaml / blind_bwe_with_prior.yaml (their
    sampler_callable modules don't exist in the reference tree)

Run from the repo root:  python tools/gen_tester_configs.py
"""

from __future__ import annotations

import os

import yaml

REF = "/root/reference/conf/tester"
OURS = "conf/tester"

SKIP = {
    "blind_bwe_backup.yaml",
    "blind_bwe_langevin.yaml",  # testing/blind_bwe_sampler_langevin.py absent
    "blind_bwe_with_prior.yaml",  # testing/blind_bwe_sampler_prior.py absent
}

# reference-name prefix -> our template (most specific match wins)
TEMPLATES = [
    ("blind_bwe_formal_small", "blind_bwe_formal_small_A1.yaml"),
    ("blind_bwe_formal", "blind_bwe_formal.yaml"),
    ("blind_bwe_denoise", "blind_bwe_denoise.yaml"),
    ("blind_bwe_mushra", "mushra.yaml"),
    ("blind_bwe", "blind_bwe.yaml"),
    ("bwe_formal_3000", "bwe_formal_3000.yaml"),
    ("bwe_formal", "bwe_formal_1000.yaml"),
    ("edm_", "edm_DC_correction.yaml"),
    ("", "blind_bwe.yaml"),
]

# dotted key paths transplanted from the reference file when present
TRANSPLANT = [
    "modes", "T", "order", "filter_out_cqt_DC_Nyq",
    "unconditional.num_samples", "unconditional.audio_len",
    "posterior_sampling.xi", "posterior_sampling.norm",
    "posterior_sampling.smoothl1_beta", "posterior_sampling.data_consistency",
    "posterior_sampling.start_sigma", "posterior_sampling.SNR_observations",
    "posterior_sampling.freq_weighting", "posterior_sampling.freq_weighting_filter",
    "posterior_sampling.stft_distance.mag", "posterior_sampling.stft_distance.use",
    "posterior_sampling.stft_distance.nfft", "posterior_sampling.stft_distance.logmag",
    "diff_params.same_as_training", "diff_params.sigma_data",
    "diff_params.sigma_min", "diff_params.sigma_max", "diff_params.P_mean",
    "diff_params.P_std", "diff_params.ro", "diff_params.ro_train",
    "diff_params.Schurn", "diff_params.Snoise", "diff_params.Stmin",
    "diff_params.Stmax",
    "bandwidth_extension.filter.type", "bandwidth_extension.filter.fc",
    "bandwidth_extension.filter.order", "bandwidth_extension.filter.fir_order",
    "bandwidth_extension.filter.beta", "bandwidth_extension.filter.ripple",
    "bandwidth_extension.decimate.factor",
    "bandwidth_extension.test_filter_fit", "bandwidth_extension.compute_sweep",
    "blind_bwe.test_filter.fc", "blind_bwe.test_filter.A",
    "blind_bwe.initial_conditions.fc", "blind_bwe.initial_conditions.A",
    "blind_bwe.optimization.mu", "blind_bwe.optimization.tol",
    "blind_bwe.optimization.max_iter", "blind_bwe.optimization.clamp_fc",
    "blind_bwe.optimization.clamp_A", "blind_bwe.optimization.only_negative_A",
    "blind_bwe.NFFT", "blind_bwe.fcmin", "blind_bwe.fcmax",
    "blind_bwe.Amin", "blind_bwe.Amax", "blind_bwe.SNR_observations",
    "blind_bwe.sigma_norm", "blind_bwe.gain_boost", "blind_bwe.compute_sweep",
    "blind_bwe.real_recordings.num_samples",
    "formal_test.use_AR", "formal_test.OLA", "formal_test.blind",
    "formal_test.robustness",
    "formal_test.robustness_filter.order", "formal_test.robustness_filter.fc",
    "formal_test.robustness_filter.beta",
    "complete_recording.overlap", "complete_recording.use_denoiser",
    "complete_recording.n_segments_blindstep", "complete_recording.ix_start",
    "complete_recording.std", "complete_recording.inpaint_DC",
    "complete_recording.SNR_extra_noise",
    "denoiser.sample_rate_denoiser", "denoiser.num_stages", "denoiser.depth",
    "inpainting.gap_length", "declipping.SDR", "comp_sens.percentage",
]


def get_path(d, path):
    cur = d
    for k in path.split("."):
        if not isinstance(cur, dict) or k not in cur:
            return None, False
        cur = cur[k]
    return cur, True


def set_path(d, path, value):
    keys = path.split(".")
    cur = d
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def main():
    ref_files = sorted(os.listdir(REF))
    ours_files = set(os.listdir(OURS))
    made = 0
    for fname in ref_files:
        if not fname.endswith(".yaml") or fname in SKIP or fname in ours_files:
            continue
        with open(os.path.join(REF, fname)) as f:
            ref = yaml.safe_load(f)
        stem = fname[:-5]
        template = next(t for p, t in TEMPLATES if stem.startswith(p))
        with open(os.path.join(OURS, template)) as f:
            out = yaml.safe_load(f)
        n_keys = 0
        for path in TRANSPLANT:
            val, ok = get_path(ref, path)
            if ok:
                set_path(out, path, val)
                n_keys += 1
        out["name"] = stem
        out["callable"] = "babe_tpu.testers.tester.Tester"
        out["sampler_callable"] = "babe_tpu.sampling.blind.BlindSampler"
        header = (
            f"# {stem}: hyperparameters transplanted from the reference "
            f"experiment\n# (reference: conf/tester/{fname}, {n_keys} keys; "
            f"template: {template})\n"
        )
        with open(os.path.join(OURS, fname), "w") as f:
            f.write(header + yaml.safe_dump(out, sort_keys=False))
        made += 1
        print(f"{fname}  <- {template} ({n_keys} keys)")
    print(f"generated {made} configs")


if __name__ == "__main__":
    main()
