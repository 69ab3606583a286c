"""AstroTable — EzTable + the reference's astronomy query surface.

Reference: ``AstroTable`` (simpletable.py:3007-3224) — a SimpleTable
subclass carrying RA/Dec column discovery (incl. common aliases) and
spatial verbs ``coneSearch`` / ``zoneSearch`` / ``where`` /
``selectWhere`` with ``cone=`` / ``zone=`` keywords; cone matches gain a
``separation`` column (3216).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.astro import cone_search, sphdist, zone_search
from .table import EzTable

# the reference guesses positional columns from these names
# (simpletable.py:3012-3055 set_RA/set_DEC)
_RA_NAMES = ("ra", "RA", "_RAJ2000", "RAJ2000", "ra_deg")
_DEC_NAMES = ("dec", "DEC", "Dec", "_DEJ2000", "DEJ2000", "dec_deg")


class AstroTable(EzTable):
    """EzTable with spatial query verbs (AstroTable parity)."""

    def __init__(self, df, ra_name: str | None = None, dec_name: str | None = None, **meta):
        super().__init__(df, **meta)
        self.ra_name = ra_name or self._guess(_RA_NAMES)
        self.dec_name = dec_name or self._guess(_DEC_NAMES)

    def _guess(self, candidates) -> str | None:
        cols = set(self.df.columns)
        for c in candidates:
            if c in cols:
                return c
        low = {c.lower(): c for c in self.df.columns}
        for c in candidates:
            if c.lower() in low:
                return low[c.lower()]
        return None

    def _require_radec(self):
        if not self.ra_name or not self.dec_name:
            raise ValueError(
                "no RA/Dec columns found; pass ra_name=/dec_name= "
                f"(columns: {self.df.columns})"
            )

    def _clone(self, df) -> "AstroTable":
        base = super()._clone(df)
        out = AstroTable.__new__(AstroTable)
        out.__dict__.update(base.__dict__)
        out.ra_name = self.ra_name if self.ra_name in df.columns else None
        out.dec_name = self.dec_name if self.dec_name in df.columns else None
        return out

    # -- spatial verbs (simpletable.py:3056-3224) -----------------------
    def coneSearch(self, ra0: float, dec0: float, radius_deg: float) -> "AstroTable":
        """Rows within ``radius_deg`` of (ra0, dec0); adds ``separation``."""
        self._require_radec()
        return self._clone(
            cone_search(self.df, ra0, dec0, radius_deg, ra=self.ra_name, dec=self.dec_name)
        )

    def zoneSearch(self, ramin: float, ramax: float, decmin: float, decmax: float) -> "AstroTable":
        self._require_radec()
        return self._clone(
            zone_search(self.df, ramin, ramax, decmin, decmax, ra=self.ra_name, dec=self.dec_name)
        )

    def where(self, condition: str | None = None, exprvars: dict | None = None,
              cone: tuple | None = None, zone: tuple | None = None) -> "AstroTable":
        """Combined expr ∧ cone ∧ zone filter (simpletable.py:3139-3224)."""
        out = self
        if cone is not None:
            out = out.coneSearch(*cone)
        if zone is not None:
            out = out.zoneSearch(*zone)
        if condition:
            out = out._clone(out.df.filter(F.expr(out._translate(condition, exprvars))))
        return out

    def selectWhere(self, fields, condition: str | None = None, exprvars: dict | None = None,
                    cone: tuple | None = None, zone: tuple | None = None) -> "AstroTable":
        out = self.where(condition, exprvars, cone=cone, zone=zone)
        names = out._expand_fields(fields)
        if cone is not None and "separation" not in names and "separation" in out.df.columns:
            names.append("separation")  # reference adds it on cone (3216)
        return out._clone(out.df.select(*out._select_cols(names)))

    def separation_to(self, ra0: float, dec0: float, name: str = "separation") -> "AstroTable":
        self._require_radec()
        return self._clone(
            self.df.withColumn(
                name, sphdist(self.ra_name, self.dec_name, F.lit(float(ra0)), F.lit(float(dec0)))
            )
        )
