"""Aircraft-derived weather feed (beyond reference).

Mode-S EHS/MRAR replies carry wind, temperature, pressure and hazard
reports (decode/commb.py BDS4,4/4,5; BDS5,0/6,0 give the wind triangle
implicitly). Meteorological services assimilate exactly this data
(AMDAR-style soundings from ordinary traffic). This plugin joins each
met-carrying reply with the aircraft's last known ADS-B position/altitude
and appends one NDJSON observation per report:

    {"ts": ..., "icao": "4840d6", "lat": ..., "lon": ..., "alt_ft": ...,
     "wind_speed_kt": ..., "wind_dir_deg": ..., "temperature_c": ...,
     "pressure_hpa": ..., "turbulence": "moderate", ...}

`modes_rx --wx FILE` ('-' for stdout).
"""

from __future__ import annotations

import json
from typing import Optional

from ..decode.parse import parse
from ..exceptions import ADSBError

# commb fields worth publishing as weather observations
_WX_FIELDS = ("wind_speed_kt", "wind_dir_deg", "temperature_c",
              "pressure_hpa", "humidity_pct", "turbulence", "wind_shear",
              "microburst", "icing", "wake_vortex")


class output_wx:
    """Plugin: call output(msg) per raw wire message."""

    def __init__(self, path: str, parser: Optional[parse] = None,
                 stale_pos_s: float = 30.0):
        self.path = path
        self._parser = parser or parse()
        self.stale_pos_s = stale_pos_s
        # icao -> (lat, lon, alt_ft, timestamp) last ADS-B fix
        self._last_fix: dict = {}
        self.n_obs = 0
        self._fh = None

    def output(self, msg: str) -> None:
        try:
            rep = self._parser.parse(msg)
        except ADSBError:
            return
        if rep.icao is None:
            return
        if rep.lat is not None:
            if len(self._last_fix) > 4096:      # bound: FIFO-drop oldest
                for k in list(self._last_fix)[:2048]:
                    del self._last_fix[k]
            self._last_fix[rep.icao] = (rep.lat, rep.lon, rep.altitude_ft,
                                        rep.timestamp)
        if not rep.commb:
            return
        obs = {k: rep.commb[k] for k in _WX_FIELDS if k in rep.commb}
        if not obs:
            return
        rec = {"ts": round(rep.timestamp, 3), "icao": rep.icao_hex}
        fix = self._last_fix.get(rep.icao)
        if fix is not None and rep.timestamp - fix[3] <= self.stale_pos_s:
            rec["lat"], rec["lon"] = round(fix[0], 5), round(fix[1], 5)
            if fix[2] is not None:
                rec["alt_ft"] = fix[2]
        if "alt_ft" not in rec and rep.altitude_ft is not None:
            rec["alt_ft"] = rep.altitude_ft     # the reply's own AC field
        rec.update(obs)
        self._write(json.dumps(rec))
        self.n_obs += 1

    def _write(self, line: str) -> None:
        if self.path == "-":
            print(line, flush=True)
            return
        try:
            if self._fh is None:
                self._fh = open(self.path, "a")
            self._fh.write(line + "\n")
            self._fh.flush()
        except OSError:
            pass    # observation output must never stall the decode loop

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
