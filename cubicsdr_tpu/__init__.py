"""cubicsdr_tpu — a TPU-native software-defined-radio framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CubicSDR
(reference: cjcliffe/CubicSDR, C++/liquid-dsp/wxWidgets): wideband IQ
channelization, NCO mixing, multi-rate resampling, analog and digital
demodulation, spectrum/waterfall processing, audio mixing/recording, and
session/config persistence — expressed as pure block-streaming functions
``(state, block) -> (state, block)`` compiled under ``jax.jit`` and sharded
over TPU meshes with ``shard_map``.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  - ``cubicsdr_tpu.stream``   — block-streaming substrate (ref: src/IOThread.*,
    src/util/ThreadBlockingQueue.*); replaces the 11-thread queue graph with a
    compiled block-synchronous pipeline.
  - ``cubicsdr_tpu.ops``      — the DSP kernel library (ref: liquid-dsp
    primitives used throughout src/): NCO, FIR/IIR, polyphase resamplers,
    channelizers, discriminators, FFT spectrum math.
  - ``cubicsdr_tpu.modems``   — modem library (ref: src/modules/modem/**).
  - ``cubicsdr_tpu.visual``   — spectrum/waterfall/scope processors
    (ref: src/process/**).
  - ``cubicsdr_tpu.io``       — IQ sources, WAV writing, recording policy
    (ref: src/sdr/SoapySDRThread.*, src/audio/AudioFileWAV.*).
  - ``cubicsdr_tpu.parallel`` — mesh/sharding/halo-exchange: the distributed
    backend (channels x time sharding over ICI/DCN).
  - ``cubicsdr_tpu.app``      — receiver shell: demodulator manager, config,
    sessions, bookmarks (ref: src/CubicSDR.*, src/demod/DemodulatorMgr.*,
    src/AppConfig.*, src/SessionMgr.*, src/BookmarkMgr.*).
"""

__version__ = "0.1.0"

