"""Multi-receiver frame correlator for multilateration (SURVEY.md §3.5).

The reference's mlat story: N receivers with PPS-disciplined timestamps
observe the same Mode S frame; matching on the hex payload gives one
{station_position: arrival_time} set per frame, which python/mlat.py's
TDOA solver turns into a position. The reference left the correlation to
offline scripts; this module is the online correlator the modes_mlat app
drives: feed it each station's wire messages, it groups identical frames
arriving within the light-travel window and solves once enough stations
have reported.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

from ..exceptions import ADSBError, MlatNonConvergeError
from . import mlat as mlat_mod
from .altitude import decode_alt
from .fields import modes_reply

# Same-frame arrival spread is bounded by the stations' light-travel
# separation (~1 ms per 300 km) plus clock error; 10 ms covers any
# realistic station network.
DEFAULT_WINDOW_S = 0.010


@dataclasses.dataclass
class MlatSolution:
    hexframe: str
    icao: Optional[int]
    lat: float
    lon: float
    alt_m: float
    n_stations: int
    timestamp: float          # earliest station arrival time


def _frame_altitude_ft(hexframe: str) -> Optional[float]:
    """Decoded AC altitude when the frame carries one (DF0/4/16/20) —
    the 3-station altitude constraint."""
    nbits = len(hexframe) * 4
    data = int(hexframe, 16)
    df = data >> (nbits - 5)
    if df not in (0, 4, 16, 20):
        return None
    try:
        rep = modes_reply(data, nbits)
        return decode_alt(rep["ac"], bit13=True)
    except ADSBError:
        return None


class mlat_correlator:
    """Group identical frames across stations; solve when ready.

    stations: list of (lat, lon, alt) per station index. A frame's entry
    solves once `min_stations` stations have reported it AND its window
    has aged past window_s (late stations improve geometry, so the solve
    waits for the window, not the minimum)."""

    def __init__(self, stations: Sequence[Tuple[float, float, float]],
                 min_stations: int = 3, window_s: float = DEFAULT_WINDOW_S,
                 alt_datum: str = "msl"):
        if len(stations) < min_stations:
            raise ValueError(f"{len(stations)} stations < min_stations "
                             f"{min_stations}")
        self.stations = [tuple(s) for s in stations]
        self.min_stations = min_stations
        self.window_s = window_s
        self.alt_datum = alt_datum
        # hexframe -> {station_index: arrival_time}
        self._pending: Dict[str, Dict[int, float]] = {}

    def feed(self, station: int, message: str) -> List[MlatSolution]:
        """One wire message ("<df> <hex> ... <timestamp>") from a station;
        returns any solutions that became ready."""
        parts = message.split()
        hexframe, t = parts[1], float(parts[5])
        arr = self._pending.setdefault(hexframe, {})
        # keep the EARLIEST arrival per station (a station can see its own
        # multipath copy later)
        if station not in arr or t < arr[station]:
            arr[station] = t
        return self.flush(now=t)

    def flush(self, now: float, force: bool = False) -> List[MlatSolution]:
        """Solve and clear entries whose window has aged out (or all,
        with force=True at end of stream)."""
        out: List[MlatSolution] = []
        for hexframe in list(self._pending):
            arr = self._pending[hexframe]
            t0 = min(arr.values())
            if not force and now - t0 <= self.window_s:
                continue
            del self._pending[hexframe]
            if len(arr) < self.min_stations:
                continue
            replies = {self.stations[s]: t for s, t in arr.items()}
            alt_ft = _frame_altitude_ft(hexframe)
            try:
                lat, lon, alt_m = mlat_mod.mlat(replies, alt_ft,
                                                alt_datum=self.alt_datum)
            except MlatNonConvergeError:
                continue          # drop-and-continue, like the parse loop
            nbits = len(hexframe) * 4
            data = int(hexframe, 16)
            df = data >> (nbits - 5)
            icao = (data >> (nbits - 32)) & 0xFFFFFF if df in (11, 17, 18) \
                else None
            out.append(MlatSolution(hexframe, icao, lat, lon, alt_m,
                                    len(arr), t0))
        return out
