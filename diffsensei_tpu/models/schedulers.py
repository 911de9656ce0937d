"""Diffusion noise schedulers as pure jnp functions.

The reference delegates scheduler math to diffusers (``DDPMScheduler`` for training
noise at ``scripts/train/train.py:344-353``; Euler/DDIM-style sampling via
``scheduler.scale_model_input`` / ``scheduler.step`` in
``src/pipelines/pipeline_diffsensei.py:317,337``). Here each scheduler is a frozen
table pytree plus stateless step functions indexed by the *loop counter*, so the
whole denoising loop compiles to a single ``lax.fori_loop`` — no data-dependent
control flow, no host round-trips per step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NUM_TRAIN_TIMESTEPS = 1000
BETA_START = 0.00085
BETA_END = 0.012


def _alphas_cumprod(num_train_timesteps: int = NUM_TRAIN_TIMESTEPS) -> np.ndarray:
    # "scaled_linear" beta schedule (Stable Diffusion family)
    betas = np.linspace(BETA_START**0.5, BETA_END**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


# ---------------------------------------------------------------------------
# Training-time DDPM forward process
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Forward-process tables; used by the train step to noise latents."""

    num_train_timesteps: int = NUM_TRAIN_TIMESTEPS

    def __post_init__(self):
        acp = _alphas_cumprod(self.num_train_timesteps)
        object.__setattr__(self, "_sqrt_acp", jnp.asarray(np.sqrt(acp), jnp.float32))
        object.__setattr__(self, "_sqrt_1macp",
                           jnp.asarray(np.sqrt(1.0 - acp), jnp.float32))

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(acp_t) x_0 + sqrt(1 - acp_t) eps  (per-batch timesteps)."""
        shape = (-1,) + (1,) * (sample.ndim - 1)
        a = self._sqrt_acp[timesteps].reshape(shape).astype(sample.dtype)
        b = self._sqrt_1macp[timesteps].reshape(shape).astype(sample.dtype)
        return a * sample + b * noise

    def velocity(self, sample: jnp.ndarray, noise: jnp.ndarray,
                 timesteps: jnp.ndarray) -> jnp.ndarray:
        """v-prediction target: v = sqrt(acp) eps - sqrt(1-acp) x0."""
        shape = (-1,) + (1,) * (sample.ndim - 1)
        a = self._sqrt_acp[timesteps].reshape(shape).astype(sample.dtype)
        b = self._sqrt_1macp[timesteps].reshape(shape).astype(sample.dtype)
        return a * noise - b * sample


# ---------------------------------------------------------------------------
# Sampling schedulers. All tables are length num_steps (+1 where noted) and are
# indexed by the static-loop counter i, never by the timestep value.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SamplerState:
    kind: str                      # "euler_discrete" | "ddim" | "dpmsolver++"
    timesteps: jnp.ndarray         # [num_steps] float32 (UNet conditioning input)
    sigmas: jnp.ndarray            # [num_steps + 1] (euler; zeros for ddim)
    alphas_cumprod_t: jnp.ndarray  # [num_steps] acp at t      (ddim)
    alphas_cumprod_prev: jnp.ndarray  # [num_steps] acp at prev t (ddim)
    init_noise_sigma: jnp.ndarray  # scalar: initial latent scale
    # [5, num_steps] multistep coefficient rows (dpmsolver++ only; [5, 0] else):
    # inv_alpha_i, sigma_karras_i (x0 conversion), c_x, c_d0, c_d1 (update)
    dpm_tables: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((5, 0), jnp.float32))

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    @property
    def is_multistep(self) -> bool:
        return self.kind == "dpmsolver++"


# Tables are pytree data; `kind` is static metadata (branches the step math).
jax.tree_util.register_dataclass(
    SamplerState,
    data_fields=["timesteps", "sigmas", "alphas_cumprod_t",
                 "alphas_cumprod_prev", "init_noise_sigma", "dpm_tables"],
    meta_fields=["kind"],
)


def make_euler_discrete(num_steps: int,
                        num_train_timesteps: int = NUM_TRAIN_TIMESTEPS,
                        steps_offset: int = 1) -> SamplerState:
    """EulerDiscreteScheduler mirroring the released SDXL scheduler config:
    ``timestep_spacing="leading"`` with ``steps_offset=1`` (timesteps
    ``(k*ratio)+1`` descending, e.g. 951..1 at 20 steps) and
    ``init_noise_sigma = sqrt(sigma_max^2 + 1)`` — the pairing diffusers uses
    for "leading" spacing. (A linspace/"leading-init" mix matches no diffusers
    config; ADVICE r1.)"""
    acp = _alphas_cumprod(num_train_timesteps)
    sigmas_full = np.sqrt((1.0 - acp) / acp)
    step_ratio = num_train_timesteps // num_steps
    timesteps = (np.arange(num_steps, dtype=np.float64) * step_ratio).round()
    timesteps = (timesteps + steps_offset)[::-1].copy()
    sigmas = np.interp(timesteps, np.arange(num_train_timesteps), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]])
    init_noise_sigma = np.sqrt(sigmas.max() ** 2 + 1.0)
    zeros = np.zeros(num_steps)
    return SamplerState(
        kind="euler_discrete",
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        alphas_cumprod_t=jnp.asarray(zeros, jnp.float32),
        alphas_cumprod_prev=jnp.asarray(zeros, jnp.float32),
        init_noise_sigma=jnp.asarray(init_noise_sigma, jnp.float32),
    )


def make_ddim(num_steps: int,
              num_train_timesteps: int = NUM_TRAIN_TIMESTEPS,
              steps_offset: int = 1) -> SamplerState:
    """DDIMScheduler (eta=0) with SD defaults ("leading" spacing, offset 1)."""
    acp = _alphas_cumprod(num_train_timesteps)
    step_ratio = num_train_timesteps // num_steps
    timesteps = (np.arange(num_steps) * step_ratio).round()[::-1].astype(np.int64)
    timesteps = timesteps + steps_offset
    prev_timesteps = timesteps - step_ratio
    final_alpha = 1.0  # set_alpha_to_one=False default uses acp[0]; SDXL uses acp[0]
    acp_t = acp[np.clip(timesteps, 0, num_train_timesteps - 1)]
    acp_prev = np.where(prev_timesteps >= 0,
                        acp[np.clip(prev_timesteps, 0, num_train_timesteps - 1)],
                        acp[0])
    del final_alpha
    return SamplerState(
        kind="ddim",
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sigmas=jnp.zeros(num_steps + 1, jnp.float32),
        alphas_cumprod_t=jnp.asarray(acp_t, jnp.float32),
        alphas_cumprod_prev=jnp.asarray(acp_prev, jnp.float32),
        init_noise_sigma=jnp.asarray(1.0, jnp.float32),
    )


def make_dpmpp_2m(num_steps: int,
                  num_train_timesteps: int = NUM_TRAIN_TIMESTEPS,
                  steps_offset: int = 1) -> SamplerState:
    """DPM-Solver++ (2M), epsilon-prediction, VP-scaled latents — the
    ``DPMSolverMultistepScheduler(algorithm_type="dpmsolver++",
    solver_order=2, lower_order_final=True, final_sigmas_type="zero")``
    configuration diffusers users run SDXL with, at the same "leading"
    timestep spacing as our Euler. A second-order linear-multistep exponential
    integrator: same 20-UNet-call cost as Euler, materially lower
    discretization error (usable down to ~12 steps).

    Latent convention: ``init_noise_sigma = 1`` and identity
    ``scale_model_input`` (VP space, x_t = a_t x0 + s_t eps) — unlike Euler's
    sigma-space latents. All step math is precomputed into ``dpm_tables``:
    with lam = -log(sigma_karras), h = lam[i+1]-lam[i], h0 = lam[i]-lam[i-1],
      x0_i   = inv_alpha_i * x - sig_k_i * eps
      x_next = c_x * x + c_d0 * x0_i + c_d1 * (x0_i - x0_{i-1})
      c_x    = s_{i+1}/s_i,  c_d0 = a_{i+1} (1 - exp(-h)),
      c_d1   = 0.5 c_d0 h/h0   (0 at the first and final steps: warmup +
                                lower_order_final, matching diffusers)
    The final boundary point is sigma = 0 (final_sigmas_type="zero"):
    c_x = 0, c_d0 = 1 — the last update returns the predicted x0 exactly.
    """
    acp = _alphas_cumprod(num_train_timesteps)
    sigmas_full = np.sqrt((1.0 - acp) / acp)
    step_ratio = num_train_timesteps // num_steps
    timesteps = (np.arange(num_steps, dtype=np.float64) * step_ratio).round()
    timesteps = (timesteps + steps_offset)[::-1].copy()
    sig_k = np.interp(timesteps, np.arange(num_train_timesteps), sigmas_full)
    sig_k = np.concatenate([sig_k, [0.0]])          # boundary: sigma -> 0
    alpha = 1.0 / np.sqrt(1.0 + sig_k[:-1] ** 2)    # VP alpha at the N points
    sigma_vp = sig_k[:-1] * alpha
    lam = -np.log(sig_k[:-1])                       # lambda = log(a/s)

    c_x = np.zeros(num_steps)
    c_d0 = np.zeros(num_steps)
    c_d1 = np.zeros(num_steps)
    for i in range(num_steps):
        if i == num_steps - 1:                      # final: to sigma = 0
            c_x[i], c_d0[i], c_d1[i] = 0.0, 1.0, 0.0
            continue
        h = lam[i + 1] - lam[i]
        c_x[i] = sigma_vp[i + 1] / sigma_vp[i]
        c_d0[i] = (1.0 / np.sqrt(1.0 + sig_k[i + 1] ** 2)) * (1 - np.exp(-h))
        if i > 0:                                   # first step: first order
            c_d1[i] = 0.5 * c_d0[i] * h / (lam[i] - lam[i - 1])
    tables = np.stack([1.0 / alpha, sig_k[:-1], c_x, c_d0, c_d1])
    zeros = np.zeros(num_steps)
    return SamplerState(
        kind="dpmsolver++",
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sigmas=jnp.asarray(sig_k, jnp.float32),
        alphas_cumprod_t=jnp.asarray(zeros, jnp.float32),
        alphas_cumprod_prev=jnp.asarray(zeros, jnp.float32),
        init_noise_sigma=jnp.asarray(1.0, jnp.float32),
        dpm_tables=jnp.asarray(tables, jnp.float32),
    )


def make_sampler(kind: str, num_steps: int) -> SamplerState:
    if kind == "euler_discrete":
        return make_euler_discrete(num_steps)
    if kind == "ddim":
        return make_ddim(num_steps)
    if kind == "dpmsolver++":
        return make_dpmpp_2m(num_steps)
    raise ValueError(f"unknown sampler kind: {kind}")


def scale_model_input(state: SamplerState, sample: jnp.ndarray,
                      i: jnp.ndarray) -> jnp.ndarray:
    """Pre-UNet latent scaling at loop step i."""
    if state.kind == "euler_discrete":
        sigma = state.sigmas[i]
        return (sample / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)
    return sample


def multistep_step(state: SamplerState, model_output: jnp.ndarray,
                   i: jnp.ndarray, sample: jnp.ndarray,
                   prev_x0: jnp.ndarray):
    """DPM-Solver++ (2M) update at loop step i.

    ``prev_x0`` is the previous step's x0 prediction (the multistep history;
    pass zeros at i = 0 — its c_d1 coefficient is 0 so the value is unused).
    Returns ``(prev_sample, x0)``; thread x0 back in as the next carry.
    """
    assert state.kind == "dpmsolver++", state.kind
    f32 = jnp.float32
    out = model_output.astype(f32)
    x = sample.astype(f32)
    inv_alpha, sig_k, c_x, c_d0, c_d1 = (state.dpm_tables[r, i]
                                         for r in range(5))
    x0 = inv_alpha * x - sig_k * out
    prev = c_x * x + c_d0 * x0 + c_d1 * (x0 - prev_x0.astype(f32))
    return prev.astype(sample.dtype), x0.astype(sample.dtype)


def step(state: SamplerState, model_output: jnp.ndarray, i: jnp.ndarray,
         sample: jnp.ndarray) -> jnp.ndarray:
    """x_t -> x_{t-1} at loop step i (epsilon-prediction)."""
    f32 = jnp.float32
    out = model_output.astype(f32)
    x = sample.astype(f32)
    if state.kind == "euler_discrete":
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        pred_x0 = x - sigma * out
        derivative = (x - pred_x0) / sigma
        prev = x + derivative * (sigma_next - sigma)
    elif state.kind == "ddim":
        a_t = state.alphas_cumprod_t[i]
        a_prev = state.alphas_cumprod_prev[i]
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * out) / jnp.sqrt(a_t)
        direction = jnp.sqrt(1.0 - a_prev) * out
        prev = jnp.sqrt(a_prev) * pred_x0 + direction
    else:
        raise ValueError(state.kind)
    return prev.astype(sample.dtype)
