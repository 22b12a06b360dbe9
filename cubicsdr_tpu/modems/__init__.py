"""Modem library — factory registry + analog and digital demodulators.

Mirrors the reference's modem module (ref: src/modules/modem/Modem.h:129-153:
``addModemFactory/makeModem`` registry and the
``checkSampleRate -> buildKit -> demodulate -> disposeKit`` contract), with a
TPU-shaped contract: a modem *builds* a jittable StreamOp (the "kit") that
turns IQ blocks at the modem bandwidth into audio blocks at the audio rate.
"""

from cubicsdr_tpu.modems.base import (  # noqa: F401
    Modem, ModemArg, register_modem, make_modem, modem_names,
    MIN_BANDWIDTH,
)
from cubicsdr_tpu.modems import analog  # noqa: F401
from cubicsdr_tpu.modems import digital  # noqa: F401
