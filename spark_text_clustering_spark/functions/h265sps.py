"""H.265/HEVC sequence-parameter-set codec — pure stdlib, public spec
(ITU-T H.265 §7.3.2.2 seq_parameter_set_rbsp, §7.4.3.2 semantics;
ISO/IEC 14496-15 §8.3.3.1 HEVCDecoderConfigurationRecord).

Round 7: the hev1/hvc1 twin of ``h264sps.py`` — HEVC is the second
codec a 100 TB asset catalog meets, and exactly like AVC its
configuration box (``hvcC``) carries the raw SPS NAL from which
profile, level, and TRUE dimensions (luma samples minus the conformance
window) parse without touching a sample. Frame decode (CTU entropy
coding) stays the honest NotImplementedError boundary.

Both directions in-repo: ``encode_sps_hevc`` writes a Main-profile SPS
with an exact conformance window for non-aligned dimensions;
``parse_sps_hevc`` reads it back (profile_tier_level incl. sub-layer
flag handling, chroma-dependent window units). Shares the Exp-Golomb
bit I/O and RBSP escaping with the H.264 module.
"""

from __future__ import annotations

from .h264sps import _BitReader, _BitWriter, _escape_rbsp, _unescape_rbsp


def encode_sps_hevc(width: int, height: int, *, level_idc: int = 93) -> bytes:
    """A Main-profile HEVC SPS NAL (2-byte NAL header + escaped RBSP)
    coding exactly ``width``x``height`` via luma samples + conformance
    window (window units 2x2 for the coded 4:2:0 chroma). ``level_idc``
    is general_level_idc (30x the level number, e.g. 93 = level 3.1)."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if width % 2 or height % 2:
        raise ValueError("4:2:0 window units are 2px: use even dimensions")
    # code the luma plane at the next multiple of the minimum CB size (8)
    luma_w = (width + 7) // 8 * 8
    luma_h = (height + 7) // 8 * 8
    win_r = (luma_w - width) // 2
    win_b = (luma_h - height) // 2
    w = _BitWriter()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(0, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting_flag
    # --- profile_tier_level (sub_layers=0 -> fixed 96 bits) ---
    w.u(0, 2)  # general_profile_space
    w.u(0, 1)  # general_tier_flag
    w.u(1, 5)  # general_profile_idc: Main
    w.u(1 << 30, 32)  # compatibility flags: bit for profile 1
    w.u(1, 1)  # general_progressive_source_flag
    w.u(0, 1)  # general_interlaced_source_flag
    w.u(1, 1)  # general_non_packed_constraint_flag
    w.u(1, 1)  # general_frame_only_constraint_flag
    w.u(0, 22)  # reserved_zero_43bits (upper)
    w.u(0, 22)  # reserved_zero_43bits (lower) + inbld bit
    w.u(level_idc, 8)  # general_level_idc
    # --- back to the SPS body ---
    w.ue(0)  # sps_seq_parameter_set_id
    w.ue(1)  # chroma_format_idc: 4:2:0
    w.ue(luma_w)  # pic_width_in_luma_samples
    w.ue(luma_h)  # pic_height_in_luma_samples
    if win_r or win_b:
        w.u(1, 1)  # conformance_window_flag
        w.ue(0)  # left offset
        w.ue(win_r)  # right offset (in 2px chroma units)
        w.ue(0)  # top
        w.ue(win_b)
    else:
        w.u(0, 1)
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.u(0, 1)  # sps_sub_layer_ordering_info_present_flag
    w.ue(1)  # sps_max_dec_pic_buffering_minus1[0]
    w.ue(0)  # sps_max_num_reorder_pics[0]
    w.ue(0)  # sps_max_latency_increase_plus1[0]
    w.ue(0)  # log2_min_luma_coding_block_size_minus3
    w.ue(3)  # log2_diff_max_min_luma_coding_block_size (CTU 64)
    w.ue(0)  # log2_min_luma_transform_block_size_minus2
    w.ue(3)  # log2_diff_max_min_luma_transform_block_size
    w.ue(2)  # max_transform_hierarchy_depth_inter
    w.ue(2)  # max_transform_hierarchy_depth_intra
    w.u(0, 1)  # scaling_list_enabled_flag
    w.u(0, 1)  # amp_enabled_flag
    w.u(0, 1)  # sample_adaptive_offset_enabled_flag
    w.u(0, 1)  # pcm_enabled_flag
    w.ue(0)  # num_short_term_ref_pic_sets
    w.u(0, 1)  # long_term_ref_pics_present_flag
    w.u(0, 1)  # sps_temporal_mvp_enabled_flag
    w.u(0, 1)  # strong_intra_smoothing_enabled_flag
    w.u(0, 1)  # vui_parameters_present_flag
    w.u(0, 1)  # sps_extension_present_flag
    rbsp = w.rbsp_trailing()
    # NAL header: forbidden_zero(1)=0, nal_unit_type(6)=33 (SPS_NUT),
    # nuh_layer_id(6)=0, nuh_temporal_id_plus1(3)=1
    return bytes([33 << 1, 1]) + _escape_rbsp(rbsp)


def _parse_ptl(r: "_BitReader", max_sub_layers_minus1: int) -> dict:
    r.u(2)  # profile_space
    tier = r.u(1)
    profile_idc = r.u(5)
    r.u(32)  # compatibility flags
    r.u(4)  # progressive/interlaced/non-packed/frame-only
    r.u(22)
    r.u(22)  # reserved 43+1 bits
    level_idc = r.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(r.u(1))
        sub_level.append(r.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            r.u(2)  # reserved_zero_2bits alignment
    for p, lv in zip(sub_profile, sub_level):
        if p:
            r.u(88)  # sub-layer profile block
        if lv:
            r.u(8)  # sub_layer_level_idc
    return {"tier": tier, "profile_idc": profile_idc, "level_idc": level_idc}


def parse_sps_hevc(nal: bytes) -> dict:
    """{profile_idc, level_idc, width, height} from an HEVC SPS NAL
    (2-byte header + escaped RBSP). Handles sub-layer PTL blocks and the
    chroma-dependent conformance-window units."""
    if len(nal) < 6:
        raise ValueError("HEVC SPS NAL too short")
    nal_type = (nal[0] >> 1) & 0x3F
    if nal_type != 33:
        raise ValueError(f"not an HEVC SPS NAL (type {nal_type})")
    r = _BitReader(_unescape_rbsp(nal[2:]))
    r.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.u(3)
    if max_sub_layers_minus1 > 6:
        raise ValueError("implausible sps_max_sub_layers")
    r.u(1)  # temporal_id_nesting
    ptl = _parse_ptl(r, max_sub_layers_minus1)
    r.ue()  # sps_seq_parameter_set_id
    chroma_format_idc = r.ue()
    if chroma_format_idc > 3:
        raise ValueError("bad chroma_format_idc")
    if chroma_format_idc == 3:
        r.u(1)  # separate_colour_plane_flag
    luma_w = r.ue()
    luma_h = r.ue()
    win_l = win_r = win_t = win_b = 0
    if r.u(1):  # conformance_window_flag
        win_l, win_r, win_t, win_b = r.ue(), r.ue(), r.ue(), r.ue()
    # §7.4.3.2.1: window offsets are in SubWidthC/SubHeightC units
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    width = luma_w - sub_w * (win_l + win_r)
    height = luma_h - sub_h * (win_t + win_b)
    if width <= 0 or height <= 0:
        raise ValueError("conformance window exceeds coded size")
    return {
        "profile_idc": ptl["profile_idc"],
        "level_idc": ptl["level_idc"],
        "width": width,
        "height": height,
    }


def encode_hvcc(sps: bytes) -> bytes:
    """An HEVCDecoderConfigurationRecord carrying one SPS array entry
    (ISO/IEC 14496-15 §8.3.3.1) — the ``hvcC`` box payload."""
    if len(sps) < 6:
        raise ValueError("SPS too short for hvcC")
    meta = parse_sps_hevc(sps)
    out = bytearray()
    out.append(1)  # configurationVersion
    out.append(meta["profile_idc"] & 0x1F)  # space/tier/profile packed
    out += (1 << 30).to_bytes(4, "big")  # compatibility flags
    out += b"\x00" * 6  # constraint indicator flags
    out.append(meta["level_idc"])
    out += (0xF000).to_bytes(2, "big")  # reserved + min_spatial_seg
    out.append(0xFC)  # reserved + parallelismType
    out.append(0xFC | 1)  # reserved + chroma_format_idc (4:2:0)
    out.append(0xF8)  # reserved + bit_depth_luma_minus8
    out.append(0xF8)  # reserved + bit_depth_chroma_minus8
    out += b"\x00\x00"  # avgFrameRate
    out.append((0 << 6) | (0 << 3) | 3)  # frameRate/numTemporal/lengthSize
    out.append(1)  # numOfArrays
    out.append(0x80 | 33)  # array_completeness + NAL type 33 (SPS)
    out += (1).to_bytes(2, "big")  # numNalus
    out += len(sps).to_bytes(2, "big") + sps
    return bytes(out)


def parse_hvcc(data: bytes) -> dict:
    """Parse an HEVCDecoderConfigurationRecord: find the SPS array and
    parse the first SPS. Returns {profile_idc, level_idc, width, height,
    n_arrays}."""
    if len(data) < 23:
        raise ValueError("hvcC record too short")
    if data[0] != 1:
        raise ValueError(f"unsupported hvcC version {data[0]}")
    n_arrays = data[22]
    off = 23
    for _ in range(n_arrays):
        if off + 3 > len(data):
            raise ValueError("truncated hvcC array header")
        nal_type = data[off] & 0x3F
        n_nalus = int.from_bytes(data[off + 1 : off + 3], "big")
        off += 3
        for _ in range(n_nalus):
            if off + 2 > len(data):
                raise ValueError("truncated hvcC NAL length")
            ln = int.from_bytes(data[off : off + 2], "big")
            off += 2
            if off + ln > len(data):
                raise ValueError("truncated hvcC NAL payload")
            if nal_type == 33:  # SPS_NUT
                meta = parse_sps_hevc(data[off : off + ln])
                meta["n_arrays"] = n_arrays
                return meta
            off += ln
    raise ValueError("hvcC carries no SPS array")
