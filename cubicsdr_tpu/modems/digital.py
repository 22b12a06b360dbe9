"""Digital modem bank (reference: src/modules/modem/digital/**).

Implemented incrementally; see analog.py for the kit contract.
"""

from __future__ import annotations
