"""Receiver config files — grammar parity with cconfigfile
(include/cconfigfile.h:32-72, examplecfg/four.cfg, examplecfg/URA21.cfg).

Format, one channel per line::

    # comment
    R :'SERIAL OF REF'     <- 'R' (or channel 0) marks the reference dongle
    1 :'SERIAL 1'          <- channel number defines rx-matrix row order
    2 :'SERIAL 2'

The reference reads the first two characters as the index field ('R' in
either position means the reference) and the serial between the first pair
of single quotes after the colon.
"""

import dataclasses
from typing import List


@dataclasses.dataclass(frozen=True)
class ChannelDef:
    """sdrdefs analog (cconfigfile.h:25-28): devindex 0 == reference."""

    devindex: int
    serial: str


def parse_config(text: str) -> List[ChannelDef]:
    out: List[ChannelDef] = []
    for ln in text.splitlines():
        if not ln or ln[0] == "#":
            continue
        ids = ln[:2]
        if "R" in ids:
            devindex = 0
        else:
            try:
                devindex = int(ids)
            except ValueError:
                continue
        st = ln.find(":")
        if st < 0:
            continue
        st = ln.find("'", st + 1)
        end = ln.find("'", st + 1)
        if st < 0 or end < 0:
            continue
        out.append(ChannelDef(devindex=devindex, serial=ln[st + 1 : end]))
    return out


def read_config(fname: str) -> List[ChannelDef]:
    with open(fname, "r") as f:
        return parse_config(f.read())


def get_refname(defs: List[ChannelDef]) -> str:
    """cconfigfile::get_refname (cconfigfile.h:61-71)."""
    for d in defs:
        if d.devindex == 0:
            return d.serial
    return ""


def signal_channels(defs: List[ChannelDef]) -> List[ChannelDef]:
    """Non-reference channels in rx-matrix order."""
    return sorted(
        (d for d in defs if d.devindex != 0), key=lambda d: d.devindex
    )
