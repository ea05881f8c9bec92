"""H.264 sequence-parameter-set (SPS) codec — pure stdlib, public spec
(ITU-T H.264 §7.3.2.1.1 seq_parameter_set_rbsp, §7.4.2.1.1 semantics).

Round 7: enriches mp4 cataloging for the dominant real-world codec.
Frame decode of H.264 (CABAC/CAVLC macroblock entropy coding) remains
the honest NotImplementedError boundary, but the avcC configuration box
inside an ``avc1`` sample entry carries the raw SPS NAL, and the SPS
alone yields what a 100 TB asset catalog needs: profile, level, and the
CODED dimensions (macroblock grid minus frame cropping) — without
touching a single sample byte.

Both directions are in-repo so the parse path is round-trip- and
fuzz-testable: ``encode_sps`` writes a Baseline-profile SPS with exact
cropping for arbitrary (not just MB-aligned) dimensions, and
``parse_sps`` reads any profile (handling the high-profile
chroma/bit-depth/scaling-list prefix), with RBSP emulation-prevention
escaping applied on both sides (§7.4.1.1).
"""

from __future__ import annotations


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int) -> None:
        # Exp-Golomb: leading zeros = len(bin(val+1))-1, then val+1
        code = val + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def rbsp_trailing(self) -> bytes:
        self.bits.append(1)  # rbsp_stop_one_bit
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("SPS bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("implausible Exp-Golomb code in SPS")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: 0x000000/1/2/3 -> 0x00000300/...
    (§7.4.1.1) so the NAL payload never contains a start-code prefix."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3 and i + 1 < len(nal) and nal[i + 1] <= 3:
            zeros = 0  # drop the emulation-prevention byte
        else:
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def encode_sps(width: int, height: int, *, level_idc: int = 30) -> bytes:
    """A complete Baseline-profile SPS NAL (header byte + escaped RBSP)
    coding exactly ``width``x``height`` via the macroblock grid plus
    frame cropping (CropUnit 2x2 for the implied 4:2:0 chroma)."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if width % 2 or height % 2:
        raise ValueError("4:2:0 cropping units are 2px: use even dimensions")
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    crop_r = (mb_w * 16 - width) // 2
    crop_b = (mb_h * 16 - height) // 2
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)  # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(0, 1)  # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0)  # left
        w.ue(crop_r)  # right
        w.ue(0)  # top
        w.ue(crop_b)  # bottom
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    rbsp = w.rbsp_trailing()
    return bytes([0x67]) + _escape_rbsp(rbsp)  # nal_ref_idc=3, type=7 (SPS)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(nal: bytes) -> dict:
    """{profile_idc, level_idc, width, height} from an SPS NAL (header
    byte + escaped RBSP). Handles the high-profile prefix (chroma format,
    bit depths, scaling lists) and frame cropping with the spec's
    chroma-dependent crop units. Raises ValueError on malformed input."""
    if len(nal) < 4:
        raise ValueError("SPS NAL too short")
    if nal[0] & 0x1F != 7:
        raise ValueError(f"not an SPS NAL (type {nal[0] & 0x1F})")
    r = _BitReader(_unescape_rbsp(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # default: 4:2:0
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # §7.4.2.1.1: crop units depend on chroma format & field coding
    if separate_colour_plane or chroma_format_idc == 0:
        unit_x, unit_y = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        unit_x, unit_y = sub_w, sub_h * (2 - frame_mbs_only)
    width = pic_width_in_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16 - unit_y * (
        crop_t + crop_b
    )
    if width <= 0 or height <= 0:
        raise ValueError("SPS cropping exceeds coded size")
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
    }


def encode_avcc(sps: bytes, *, pps: bytes = b"\x68\xce\x38\x80") -> bytes:
    """An AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.2.4.1)
    carrying one SPS + one PPS — the payload of the ``avcC`` box inside
    an ``avc1`` sample entry."""
    if len(sps) < 4:
        raise ValueError("SPS too short for avcC")
    out = bytearray()
    out += bytes([1, sps[1], sps[2], sps[3]])  # version, profile/compat/level
    out += bytes([0xFF])  # reserved(6) + lengthSizeMinusOne=3
    out += bytes([0xE1])  # reserved(3) + numOfSPS=1
    out += len(sps).to_bytes(2, "big") + sps
    out += bytes([1])  # numOfPPS
    out += len(pps).to_bytes(2, "big") + pps
    return bytes(out)


def parse_avcc(data: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord and the first SPS within:
    {profile_idc, level_idc, width, height, n_sps, n_pps}."""
    if len(data) < 7:
        raise ValueError("avcC record too short")
    if data[0] != 1:
        raise ValueError(f"unsupported avcC version {data[0]}")
    n_sps = data[5] & 0x1F
    if n_sps < 1:
        raise ValueError("avcC carries no SPS")
    off = 6
    if off + 2 > len(data):
        raise ValueError("truncated avcC SPS length")
    sps_len = int.from_bytes(data[off : off + 2], "big")
    off += 2
    if off + sps_len > len(data):
        raise ValueError("truncated avcC SPS payload")
    sps = data[off : off + sps_len]
    off += sps_len
    # skip remaining SPS entries to count PPS
    for _ in range(n_sps - 1):
        if off + 2 > len(data):
            raise ValueError("truncated avcC SPS table")
        ln = int.from_bytes(data[off : off + 2], "big")
        off += 2 + ln
    if off >= len(data):
        raise ValueError("truncated avcC PPS count")
    n_pps = data[off]
    meta = parse_sps(sps)
    meta["n_sps"] = n_sps
    meta["n_pps"] = n_pps
    return meta
