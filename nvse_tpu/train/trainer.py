"""Unified GAN trainer: one jitted two-optimizer step for all domains.

Replaces the reference's three near-duplicate training scripts
(train_tf_wi_inv.py, train_time_wi_inv.py,
train_tf_wi_inv_joint_denoise_vocoder.py) with a single step builder
parameterised by domain:

  * "tf":    MPD + MRD discriminators, LS-GAN, spectral losses —
             L_G = 45·L_A + 100·(IP+GD+PTD) + 20·(L_C + 2.25·(L_R+L_I))
                   + L_GAN + L_FM + 45·L_Mel          (train_tf_wi_inv.py:211-239)
             L_D = mrd_weight·L_MRD + L_MPD           (train_tf_wi_inv.py:202)
  * "time":  MPD + MSD, LS for HiFiGAN/iSTFTNet else hinge —
             L_G = L_GAN + L_FM + 45·L_Mel            (train_time_wi_inv.py:229-233)
             L_D = L_MSD + L_MPD                      (train_time_wi_inv.py:212)

TPU-first design decisions:
  * Features (mel, mel-loss target, amp/phase spectra) are computed
    ON-DEVICE inside the jitted step — the host pipeline ships raw audio
    segments only (the reference computes these in DataLoader workers,
    dataset.py:218-244).
  * The generator runs ONCE per step via jax.vjp; its output feeds the
    D update (stop-gradient) and the G update (cotangents pulled back
    through the saved VJP) — same compute pattern as the reference's
    shared forward + two backwards.
  * D is updated first, and the G adversarial/feature losses use the
    UPDATED discriminator parameters, matching the reference ordering.
  * Both optimizer states and params are donated; batch is sharded over
    the mesh 'data' axis, params replicated; XLA inserts the gradient
    all-reduces over ICI.

Optimizer: AdamW(lr, betas=(0.8, 0.99), weight_decay=0.01 — torch
default) with per-epoch exponential decay gamma=0.999
(train_tf_wi_inv.py:82-100), expressed as a staircase schedule over
steps_per_epoch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..losses.spectral import _masked_mean
from ..losses import (
    amplitude_loss,
    feature_loss,
    hinge_discriminator_loss,
    hinge_generator_loss,
    ls_discriminator_loss,
    ls_generator_loss,
    phase_loss,
    stft_consistency_loss,
)
from ..models import MultiPeriodDiscriminator, MultiResolutionDiscriminator, MultiScaleDiscriminator
from ..ops import amp_pha_spectrum, inverse_mel, mel_spectrogram
from ..parallel import batch_sharding, replicated_sharding


def fetch_scalars(metrics: dict) -> dict:
    """Fetch a dict of device scalars in ONE device->host transfer.

    Through the remote-TPU tunnel every individual float(x) is a full
    round trip (~seconds each); a 12-entry metrics dict fetched
    per-scalar turned stdout/summary steps into minute-long stalls.
    Stacking on device first makes it one tiny execute + one transfer.
    """
    keys = sorted(metrics)
    vals = np.asarray(jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                                 for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}


class GenState(train_state.TrainState):
    pass


class DiscState(train_state.TrainState):
    spectral: Any = None  # MSD spectral-norm power-iteration state


def make_optimizer(h, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=h.learning_rate,
        transition_steps=max(1, steps_per_epoch),
        decay_rate=h.lr_decay,
        staircase=True,
    )
    opt = optax.adamw(
        learning_rate=schedule, b1=h.adam_b1, b2=h.adam_b2,
        eps=1e-8, weight_decay=0.01,
    )
    # Opt-in global-norm gradient clipping (h.grad_clip_norm > 0). The
    # reference never clips (train_tf_wi_inv.py has bare opt.step()), so
    # the default (absent/0) preserves parity; long GAN runs on small
    # corpora can diverge (observed: FreeV NaN at ~4.6k steps on the
    # 512-utt corpus) and clipping is the standard stabilizer. Applied
    # statelessly inside the update fn — NOT via optax.chain — so the
    # optimizer state tree is identical to plain adamw and checkpoints
    # written without clipping restore into a clipped run (and back).
    clip = float(h.get("grad_clip_norm", 0.0) or 0.0)
    if clip > 0.0:
        inner = opt

        def update(grads, state, params=None, **kw):
            norm = optax.global_norm(grads)
            # inf/NaN grads: scale = clip/inf = 0 would turn inf*0 into
            # NaN and poison the params through adamw's moments. Leave
            # non-finite grads unscaled instead — they are garbage either
            # way, and downstream skip/debug logic (not silent NaN
            # params) is the right place to handle them.
            scale = jnp.where(jnp.isfinite(norm),
                              jnp.minimum(1.0, clip / (norm + 1e-16)), 1.0)
            grads = jax.tree.map(lambda g: g * scale, grads)
            return inner.update(grads, state, params, **kw)

        opt = optax.GradientTransformation(inner.init, update)
    return opt


@dataclasses.dataclass
class TrainStepFns:
    train_step: Callable
    eval_step: Callable
    gen_apply: Callable
    eval_full: Callable | None = None


def _apply_or_skip(state, grads):
    """apply_gradients, but keep the old state when grads are non-finite.

    The standard large-scale skip-step: one inf/NaN gradient (a GAN
    spike, an overflow in a long backward) otherwise poisons the adamw
    moments permanently — the params NaN one step later even though the
    loss at the fatal step looks healthy. Non-finite entries are zeroed
    before the inner update so the moments never see them, then the
    whole new state is deselected in favour of the old one. Returns
    (state, ok) with ok = 0.0 when the step was skipped. State structure
    is unchanged (checkpoint-compatible both ways).
    """
    norm = optax.global_norm(grads)
    ok = jnp.isfinite(norm)
    safe = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
    new_state = state.apply_gradients(grads=safe)
    merged = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
    return merged, ok.astype(jnp.float32)


def _build_discs(h, domain: str):
    mpd = MultiPeriodDiscriminator(periods=tuple(h.mpd_reshapes))
    if domain in ("tf", "joint"):
        scale_disc = MultiResolutionDiscriminator()
        scale_weight = h.mrd_weight
    else:
        scale_disc = MultiScaleDiscriminator()
        scale_weight = 1.0
    # opt-in third discriminator (reference defines it unused,
    # Models/models.py:384-592; we wire it behind h.use_cqtd with its
    # own loss weight h.cqtd_weight)
    cqtd = None
    if h.get("use_cqtd"):
        from ..models.cqt_discriminator import MultiScaleSubbandCQTDiscriminator
        cqtd = MultiScaleSubbandCQTDiscriminator.from_config(h)
    return mpd, scale_disc, scale_weight, cqtd


def create_states(h, generator, domain: str, rng, steps_per_epoch: int,
                  example_input: jnp.ndarray):
    """Initialise generator + discriminator TrainStates."""
    mpd, scale_disc, _, cqtd = _build_discs(h, domain)
    rng_g, rng_mpd, rng_s, rng_c = jax.random.split(rng, 4)
    gen_params = generator.init(rng_g, example_input)["params"]

    seg = int(h.segment_size)
    wave = jnp.zeros((2, seg), jnp.float32)
    mpd_params = mpd.init(rng_mpd, wave, wave)["params"]
    s_vars = scale_disc.init(rng_s, wave, wave)
    disc_params = {"mpd": mpd_params, "scale": s_vars["params"]}
    if cqtd is not None:
        disc_params["cqtd"] = cqtd.init(rng_c, wave, wave)["params"]
    spectral = s_vars.get("spectral", None)

    tx = make_optimizer(h, steps_per_epoch)
    gen_state = GenState.create(apply_fn=generator.apply, params=gen_params, tx=tx)
    disc_state = DiscState.create(
        apply_fn=None, params=disc_params, tx=make_optimizer(h, steps_per_epoch),
        spectral=spectral,
    )
    # strong-typed step counters: TrainState.create's python-int 0 is a
    # weak-typed aval; after the first apply_gradients it becomes strong
    # int32, which would retrace (and fully recompile) the train step
    # (distinct arrays — both states are donated, and donating the same
    # buffer twice is an error)
    gen_state = gen_state.replace(step=jnp.asarray(0, jnp.int32))
    disc_state = disc_state.replace(step=jnp.asarray(0, jnp.int32))
    return gen_state, disc_state


def make_train_step(h, generator, domain: str, mesh=None,
                    joint_task: str | None = None) -> TrainStepFns:
    """Build the jitted GAN train/eval step for a generator + config.

    domain "joint" (train_tf_wi_inv_joint_denoise_vocoder.py): audio is
    the CLEAN wave and aux_input the INPUT wave (noisy for denoise,
    clean for vocoder); joint_task selects the input-feature branch
    statically (one compiled step per task).
    """
    mpd, scale_disc, scale_weight, cqtd = _build_discs(h, domain)
    cqtd_weight = float(h.get("cqtd_weight", 1.0))
    use_ls = domain in ("tf", "joint") or h.model_name in ("HiFiGAN", "iSTFTNet")
    # opt-in skip-step on non-finite gradients (production stabilizer;
    # off by default for reference parity — the reference has no guard)
    skip_nonfinite = bool(h.get("skip_nonfinite_updates"))
    d_loss_fn = ls_discriminator_loss if use_ls else hinge_discriminator_loss
    g_loss_fn = ls_generator_loss if use_ls else hinge_generator_loss

    # mixed precision (SURVEY §7 step 9): h.compute_dtype="bfloat16" runs
    # the generator + discriminator trunks in bf16; features, losses,
    # params, and optimizer states stay f32 (master weights). The casts
    # are linear, so grads come back f32 through the cast transpose.
    compute_dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}.get(
        str(h.get("compute_dtype")))

    def _to_compute(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def _to_f32(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    sr = h.sampling_rate
    melargs = (h.n_fft, h.num_mels, sr, h.hop_size, h.win_size)
    # h.meloss is the fmax of the mel-loss target; null -> sr/2
    # (dataset.py:230-241 passes sr/2; the joint dataset passes h.meloss)
    meloss_fmax = h.get("meloss") or sr / 2.0
    amp_eps = 1e-5 if domain == "joint" else 1e-7  # joint dup uses 1e-5

    def features(audio, aux_input=None):
        """On-device feature extraction (reference dataset.py:218-244,
        dataset_joint_denoise_vocoder.py:344-392)."""
        meloss = mel_spectrogram(audio, *melargs, h.fmin, meloss_fmax)
        if domain == "joint":
            logamp, pha, rea, imag = amp_pha_spectrum(
                audio, h.n_fft, h.hop_size, h.win_size, eps=amp_eps)
            if joint_task == "denoise":
                inpt = amp_pha_spectrum(aux_input, h.n_fft, h.hop_size,
                                        h.win_size, eps=amp_eps)[0]
            else:  # vocoder: log pseudo-inverse mel of the input wave
                mel = mel_spectrogram(aux_input, *melargs, h.fmin, h.fmax)
                inv = inverse_mel(mel, *melargs, h.fmin, h.fmax)
                inpt = jnp.log(jnp.clip(jnp.abs(inv), 1e-5, None))
            return inpt, meloss, logamp, pha, rea, imag
        mel = mel_spectrogram(audio, *melargs, h.fmin, h.fmax)
        if domain == "tf":
            logamp, pha, rea, imag = amp_pha_spectrum(audio, h.n_fft, h.hop_size, h.win_size)
            return mel, meloss, logamp, pha, rea, imag
        return mel, meloss, None, None, None, None

    def mpd_apply(params, y, y_hat):
        out = mpd.apply({"params": _to_compute(params)},
                        *_to_compute((y, y_hat)))
        return _to_f32(out)

    def cqtd_apply(params, y, y_hat):
        out = cqtd.apply({"params": _to_compute(params)},
                         *_to_compute((y, y_hat)))
        return _to_f32(out)

    def scale_apply(params, spectral, y, y_hat, update_stats):
        params = _to_compute(params)
        y, y_hat = _to_compute((y, y_hat))
        if spectral is not None:
            variables = {"params": params, "spectral": spectral}
            if update_stats:
                out, updates = scale_disc.apply(
                    variables, y, y_hat, True, mutable=["spectral"]
                )
                return _to_f32(out), _to_f32(updates["spectral"])
            out = scale_disc.apply(variables, y, y_hat, False)
            return _to_f32(out), spectral
        return _to_f32(scale_disc.apply({"params": params}, y, y_hat)), None

    # ConvTasNet/HDDemucas with init_phase="rand" draw a fresh random
    # initial phase per forward in the reference (convtasnet.py:290);
    # feed them a per-step 'phase' rng so training sees a new draw each
    # step instead of one frozen pattern
    needs_phase_rng = str(getattr(generator, "init_phase", "")).lower() == "rand"
    phase_base = jax.random.PRNGKey(int(h.get("seed", 0)) + 0x9A5E)

    def gen_forward(gen_params, mel, aux_input, mixed=False, step=None):
        # joint: 'mel' is already the input spectrum for BSRNN_24k
        if mixed:
            gen_params = _to_compute(gen_params)
            mel, aux_input = _to_compute((mel, aux_input))
        rngs = None
        if needs_phase_rng and step is not None:
            rngs = {"phase": jax.random.fold_in(phase_base, step)}
        if domain == "tf" and aux_input is not None:
            out = generator.apply({"params": gen_params}, mel, aux_input, rngs=rngs)
        else:
            out = generator.apply({"params": gen_params}, mel, rngs=rngs)
        return _to_f32(out) if mixed else out

    tf_like = domain in ("tf", "joint")

    def train_step(gen_state: GenState, disc_state: DiscState, audio, aux_input=None):
        mel, meloss, logamp, pha, rea, imag = features(audio, aux_input)
        y = audio
        gen_aux = None if domain == "joint" else aux_input

        # --- generator forward once, VJP saved for the G update
        outs, gen_vjp = jax.vjp(
            lambda p: gen_forward(p, mel, gen_aux, mixed=True,
                                  step=gen_state.step), gen_state.params)
        if tf_like:
            logamp_g, pha_g, rea_g, imag_g, y_g = outs
        else:
            y_g = outs

        y_min = min(int(y_g.shape[-1]), int(y.shape[-1]))
        y_gc = y_g[..., :y_min]
        y_c = y[..., :y_min]
        y_g_det = jax.lax.stop_gradient(y_gc)

        # --- discriminator update (reference train_tf_wi_inv.py:190-205)
        def disc_loss(params):
            r_f, g_f, _, _ = mpd_apply(params["mpd"], y_c, y_g_det)
            loss_f, _, _ = d_loss_fn(r_f, g_f)
            (r_s, g_s, _, _), new_spec = scale_apply(
                params["scale"], disc_state.spectral, y_c, y_g_det, update_stats=True
            )
            loss_s, _, _ = d_loss_fn(r_s, g_s)
            loss = loss_s * scale_weight + loss_f
            if cqtd is not None:
                r_c, g_c, _, _ = cqtd_apply(params["cqtd"], y_c, y_g_det)
                loss_c, _, _ = d_loss_fn(r_c, g_c)
                loss = loss + cqtd_weight * loss_c
            return loss, new_spec

        (L_D, new_spectral), d_grads = jax.value_and_grad(disc_loss, has_aux=True)(
            disc_state.params
        )
        if skip_nonfinite:
            old_spectral = disc_state.spectral
            disc_state, ok_d = _apply_or_skip(disc_state, d_grads)
            if new_spectral is not None:
                new_spectral = jax.tree.map(
                    lambda n, o: jnp.where(ok_d, n, o), new_spectral, old_spectral)
        else:
            disc_state = disc_state.apply_gradients(grads=d_grads)
        disc_state = disc_state.replace(spectral=new_spectral)

        # --- generator update against the UPDATED discriminator
        def gen_loss(outs):
            metrics = {}
            if tf_like:
                logamp_g, pha_g, rea_g, imag_g, y_g = outs
                y_gc = y_g[..., :y_min]
                L_A = amplitude_loss(logamp, logamp_g)
                ip, gd, ptd = phase_loss(pha, pha_g)
                L_P = ip + gd + ptd
                # gradients flow through BOTH sides of the consistency
                # loss (the reference does not detach the re-analysed
                # spectra, train_tf_wi_inv.py:217-220)
                _, _, rea_gf, imag_gf = amp_pha_spectrum(y_gc, h.n_fft, h.hop_size, h.win_size)
                L_C = stft_consistency_loss(rea_g, rea_gf, imag_g, imag_gf)
                L_R = jnp.mean(jnp.abs(rea - rea_g))
                L_I = jnp.mean(jnp.abs(imag - imag_g))
                L_S = L_C + 2.25 * (L_R + L_I)
                metrics.update(A=L_A, IP=ip, GD=gd, PTD=ptd, C=L_C, R=L_R, I=L_I)
            else:
                y_g = outs
                y_gc = y_g[..., :y_min]
                L_A = L_P = L_S = 0.0

            y_g_mel = mel_spectrogram(y_gc, *melargs, h.fmin, meloss_fmax)
            L_Mel = jnp.mean(jnp.abs(meloss - y_g_mel))
            metrics["Mel"] = L_Mel

            r_f, g_f, fr_f, fg_f = mpd_apply(disc_state.params["mpd"], y_c, y_gc)
            (r_s, g_s, fr_s, fg_s), _ = scale_apply(
                disc_state.params["scale"], disc_state.spectral, y_c, y_gc,
                update_stats=False,
            )
            loss_gen_f, _ = g_loss_fn(g_f)
            loss_gen_s, _ = g_loss_fn(g_s)
            L_GAN = loss_gen_s * scale_weight + loss_gen_f
            L_FM = feature_loss(fr_s, fg_s) * scale_weight + feature_loss(fr_f, fg_f)
            if cqtd is not None:
                r_c, g_c, fr_c, fg_c = cqtd_apply(
                    disc_state.params["cqtd"], y_c, y_gc)
                loss_gen_c, _ = g_loss_fn(g_c)
                L_GAN = L_GAN + cqtd_weight * loss_gen_c
                L_FM = L_FM + cqtd_weight * feature_loss(fr_c, fg_c)
            L_W = L_GAN + L_FM + 45.0 * L_Mel
            if tf_like:
                L_G = 45.0 * L_A + 100.0 * L_P + 20.0 * L_S + L_W
            else:
                L_G = L_W
            metrics.update(G=L_G, GAN=L_GAN, FM=L_FM)
            return L_G, metrics

        (L_G, metrics), out_cotangents = jax.value_and_grad(gen_loss, has_aux=True)(outs)
        (g_grads,) = gen_vjp(out_cotangents)
        if skip_nonfinite:
            gen_state, ok_g = _apply_or_skip(gen_state, g_grads)
            # skipped updates this step: 0 = none, 1 = D or G, 2 = both
            metrics["skip"] = (1.0 - ok_d) + (1.0 - ok_g)
        else:
            gen_state = gen_state.apply_gradients(grads=g_grads)

        metrics["D"] = L_D
        return gen_state, disc_state, metrics

    def eval_step(gen_state: GenState, audio, aux_input=None):
        """Validation: full losses under no-grad (train_tf_wi_inv.py:313-417)."""
        mel, meloss, logamp, pha, rea, imag = features(audio, aux_input)
        outs = gen_forward(gen_state.params, mel,
                           None if domain == "joint" else aux_input)
        metrics = {}
        if domain in ("tf", "joint"):
            logamp_g, pha_g, rea_g, imag_g, y_g = outs
            metrics["A"] = amplitude_loss(logamp, logamp_g)
            ip, gd, ptd = phase_loss(pha, pha_g)
            metrics.update(IP=ip, GD=gd, PTD=ptd)
            metrics["R"] = jnp.mean(jnp.abs(rea - rea_g))
            metrics["I"] = jnp.mean(jnp.abs(imag - imag_g))
            # STFT-consistency, the 8th reference validation aggregate
            # (train_tf_wi_inv.py:338-356)
            Tc = min(int(y_g.shape[-1]), int(audio.shape[-1]))
            _, _, rea_gf, imag_gf = amp_pha_spectrum(
                y_g[..., :Tc], h.n_fft, h.hop_size, h.win_size)
            Tf = min(int(rea_g.shape[-1]), int(rea_gf.shape[-1]))
            metrics["C"] = stft_consistency_loss(
                rea_g[..., :Tf], rea_gf[..., :Tf],
                imag_g[..., :Tf], imag_gf[..., :Tf])
        else:
            y_g = outs
        y_min = min(int(y_g.shape[-1]), int(audio.shape[-1]))
        y_g_mel = mel_spectrogram(y_g[..., :y_min], *melargs, h.fmin, meloss_fmax)
        T = min(int(meloss.shape[-1]), int(y_g_mel.shape[-1]))
        metrics["Mel"] = jnp.mean(jnp.abs(meloss[..., :T] - y_g_mel[..., :T]))
        return y_g, metrics

    def eval_full(gen_state, audio, n_samples):
        """Full-utterance validation (train_tf_wi_inv.py:313-417 runs
        ragged batch-1 utterances; here the utterance is zero-padded to
        a static bucket length so shapes stay jit-stable, and every
        metric is masked to the frames whose REFERENCE features depend
        only on real samples: t·hop + n_fft/2 <= n_samples. The
        excluded tail is the reflect-pad boundary (~n_fft/2/hop
        frames), <1% of a typical utterance.

        Padding invariance caveat: for CAUSAL generators the masked
        frame-pure metrics (A/IP/GD/PTD/R/I) are exactly independent of
        the bucket size (tested). For NON-CAUSAL generators (e.g. the
        flagship BSRNN config, bidirectional time LSTM) every generated
        frame sees the zero-padded bucket tail, so the metrics carry a
        small bucket-dependent bias relative to the reference's
        unpadded batch-1 validation. Bucketing is deterministic by
        utterance length, so each utterance always lands in the same
        bucket and validation curves remain exactly comparable across
        passes; the bias is bounded in
        tests/test_train_step.py::test_eval_full_noncausal_padding_sensitivity."""
        mel, meloss, logamp, pha, rea, imag = features(audio, None)
        outs = gen_forward(gen_state.params, mel, None)
        metrics = {}
        if tf_like:
            logamp_g, pha_g, rea_g, imag_g, y_g = outs
        else:
            y_g = outs
        y_min = min(int(y_g.shape[-1]), int(audio.shape[-1]))
        y_gc = y_g[..., :y_min]
        y_g_mel = mel_spectrogram(y_gc, *melargs, h.fmin, meloss_fmax)
        Tm = min(int(meloss.shape[-1]), int(y_g_mel.shape[-1]))
        nf = jnp.clip((n_samples - h.n_fft // 2) // h.hop_size + 1, 1, None)
        mask_m = (jnp.arange(Tm) < nf).astype(jnp.float32)
        metrics["Mel"] = _masked_mean(
            jnp.abs(meloss[..., :Tm] - y_g_mel[..., :Tm]), mask_m)
        if tf_like:
            Tf = min(int(pha.shape[-1]), int(pha_g.shape[-1]))
            mask = (jnp.arange(Tf) < nf).astype(jnp.float32)
            metrics["A"] = amplitude_loss(
                logamp[..., :Tf], logamp_g[..., :Tf], mask=mask)
            ip, gd, ptd = phase_loss(pha[..., :Tf], pha_g[..., :Tf], mask=mask)
            metrics.update(IP=ip, GD=gd, PTD=ptd)
            metrics["R"] = _masked_mean(
                jnp.abs(rea[..., :Tf] - rea_g[..., :Tf]), mask)
            metrics["I"] = _masked_mean(
                jnp.abs(imag[..., :Tf] - imag_g[..., :Tf]), mask)
            _, _, rea_gf, imag_gf = amp_pha_spectrum(
                y_gc, h.n_fft, h.hop_size, h.win_size)
            Tc = min(Tf, int(rea_gf.shape[-1]))
            metrics["C"] = stft_consistency_loss(
                rea_g[..., :Tc], rea_gf[..., :Tc],
                imag_g[..., :Tc], imag_gf[..., :Tc],
                mask=mask[:Tc])
        return y_g, metrics

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        train_step = jax.jit(
            train_step,
            in_shardings=(repl, repl, data, None),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
            static_argnames=(),
        )
        # validation runs batch-1 full utterances — replicate, don't shard
        eval_step = jax.jit(eval_step, in_shardings=(repl, repl, None))
        eval_full = jax.jit(eval_full, in_shardings=(repl, None, None))

        # Enter the mesh context around invocation: models with internal
        # with_sharding_constraint hints (bare PartitionSpecs, e.g. the
        # BSRNN sp_axis sequence-parallel path) need the mesh in scope
        # when the step is first traced.
        def _in_mesh(f):
            def call(*args):
                with jax.set_mesh(mesh):
                    return f(*args)
            return call

        train_step = _in_mesh(train_step)
        eval_step = _in_mesh(eval_step)
        eval_full = _in_mesh(eval_full)
    else:
        train_step = jax.jit(train_step, donate_argnums=(0, 1))
        eval_step = jax.jit(eval_step)
        eval_full = jax.jit(eval_full)

    return TrainStepFns(train_step=train_step, eval_step=eval_step,
                        gen_apply=gen_forward, eval_full=eval_full)


class GANTrainer:
    """Convenience wrapper: states + step fns + host loop hooks.

    The full training loop (checkpointing, TensorBoard, validation
    cadence) lives in train/loop.py; this class wires model/config into
    step functions for programmatic use and tests.
    """

    def __init__(self, h, generator, domain: str, rng, steps_per_epoch: int,
                 example_input, mesh=None, joint_task: str | None = None):
        self.h = h
        self.generator = generator
        self.domain = domain
        self.mesh = mesh
        if domain == "joint" and joint_task is None:
            # the joint feature fn branches statically on the task; a
            # silent default would train denoise batches through the
            # vocoder (inverse-mel) input path
            raise ValueError(
                "domain='joint' requires joint_task='denoise'|'vocoder' "
                "(one GANTrainer per task, as loop_joint builds)")
        self.fns = make_train_step(h, generator, domain, mesh=mesh,
                                   joint_task=joint_task)
        self.gen_state, self.disc_state = create_states(
            h, generator, domain, rng, steps_per_epoch, example_input
        )

    def step(self, audio, aux_input=None):
        self.gen_state, self.disc_state, metrics = self.fns.train_step(
            self.gen_state, self.disc_state, audio, aux_input
        )
        return metrics
