"""VP8 keyframe constant tables (RFC 6386 §11.5/13.4/13.5/14.1).

The large probability/dequantization tables are the RFC's published
constants; the hex blobs below were extracted from the system libwebp's
.rodata and structurally verified (row shapes, the all-128 dummy band,
the ascending quantizer lookups ending 157/284) so no hand transcription
error can creep in. Small trees/tables are transcribed directly from the
RFC text.
"""

from __future__ import annotations

import numpy as np

def _bytes(h: str) -> bytes:
    return bytes.fromhex(h)

# AC quantizer lookup, uint16[128] (RFC 14.1)
ACQ = np.frombuffer(_bytes(
    "0400050006000700080009000a000b000c000d000e000f001000110012001300140015"
    "0016001700180019001a001b001c001d001e001f002000210022002300240025002600"
    "2700280029002a002b002c002d002e002f003000310032003300340035003600370038"
    "0039003a003c003e00400042004400460048004a004c004e0050005200540056005800"
    "5a005c005e00600062006400660068006a006c006e0070007200740077007a007d0080"
    "008300860089008c008f009200950098009b009e00a100a400a700aa00ad00b100b500"
    "b900bd00c100c500c900cd00d100d500d900dd00e100e500ea00ef00f500f900fe0003"
    "0108010d01120117011c01"
), dtype="<u2").astype(np.int32)

# DC quantizer lookup, uint8[128]
DCQ = np.frombuffer(_bytes(
    "0405060708090a0a0b0c0d0e0f101111121314141515161617171819191a1b1c1d1e1f"
    "20212223242525262728292a2b2c2d2e2e2f303132333435363738393a3b3c3d3e3f40"
    "4142434445464748494a4b4c4c4d4e4f505152535455565758595b5d5f606264656668"
    "6a6c6e707274767a7c7e80828486888a8c8f9194979a9d"
), dtype=np.uint8).astype(np.int32)

# token-probability update probs [4][8][3][11] (RFC 13.4)
UPDATE_PROBS = np.frombuffer(_bytes(
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffb0f6"
    "ffffffffffffffffffdff1fcfffffffffffffffff9fdfdfffffffffffffffffff4fcff"
    "ffffffffffffffeafefefffffffffffffffffdfffffffffffffffffffffff6feffffff"
    "ffffffffffeffdfefffffffffffffffffefffefffffffffffffffffff8feffffffffff"
    "fffffffbfffefffffffffffffffffffffffffffffffffffffffffdfeffffffffffffff"
    "fffbfefefffffffffffffffffefffefffffffffffffffffffefdfffefffffffffffffa"
    "fffefffefffffffffffffeffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffd9ffffffffffffffffffffe1fcf1fdff"
    "fffeffffffffeafaf1fafdfffdfefffffffffeffffffffffffffffffdffefeffffffff"
    "ffffffffeefdfefefffffffffffffffff8fefffffffffffffffff9feffffffffffffff"
    "fffffffffffffffffffffffffffffdfffffffffffffffffff7feffffffffffffffffff"
    "fffffffffffffffffffffffffdfefffffffffffffffffcffffffffffffffffffffffff"
    "fffffffffffffffffffffefefffffffffffffffffdffffffffffffffffffffffffffff"
    "fffffffffffffffffefdfffffffffffffffffafffffffffffffffffffffeffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffbafbfaffffffffffffffffeafbf4fefffffffffffffffbfbf3fdfefffeffffff"
    "fffffdfeffffffffffffffffecfdfefffffffffffffffffbfdfdfefeffffffffffffff"
    "fefefffffffffffffffffefefefffffffffffffffffffffffffffffffffffffffffeff"
    "fffffffffffffffffefefffffffffffffffffffeffffffffffffffffffffffffffffff"
    "fffffffffffffeffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "fffffffffffffffffffffffffffffffffffffffffffff8fffffffffffffffffffffafe"
    "fcfefffffffffffffff8fef9fdfffffffffffffffffdfdfffffffffffffffff6fdfdff"
    "fffffffffffffffcfefbfefefffffffffffffffefcfffffffffffffffff8fefdffffff"
    "fffffffffffdfffefefffffffffffffffffbfefffffffffffffffff5fbfeffffffffff"
    "fffffffdfdfefffffffffffffffffffbfdfffffffffffffffffcfdfeffffffffffffff"
    "fffffefffffffffffffffffffffcfffffffffffffffffff9fffeffffffffffffffffff"
    "fffefffffffffffffffffffffdfffffffffffffffffaffffffffffffffffffffffffff"
    "fffffffffffffffffffffffffffffffffffffffeffffffffffffffffffffffffffffff"
    "ffffffffffff"
), dtype=np.uint8).reshape(4, 8, 3, 11)

# keyframe B_PRED submode probs [10][10][9] (RFC 11.5)
KF_BMODE_PROBS = np.frombuffer(_bytes(
    "e7783059737178987098b3407eaa762e465faf458f505552489b67383a0aabdabd110d"
    "98721a11a32cc3150aad791850c31a3e2c405590470a26abd590221aaa2e371388a021"
    "ce473f14087272d00c09e251280b60b6541d102486b7598962656aa59448bb64829d6f"
    "204b504266a7634a3e28ea80293509b2f18d1a086b4a2b1a9249a631179d412669a033"
    "341f7380684f0c1bd9ff5711075744472c72330fba172f290e6eb6b71511c2422d1966"
    "c5bd171216585893962a2e2dc4cd2b61b775552623b33d2735c8571a152be8ab382233"
    "6872661d5d4d271c55ab3aa55a6240221674ce17222ba6496b36201a3301512b1f4419"
    "6a1640ab24e1722213156684bc104c7c3e124e5f5539323033c165239fd76f592e6f3c"
    "941facdbe415126f70714d55b3ff267872282a01c4f5d10a196d582b1d8ca6d5252b9a"
    "3d3f1e9b432d4401d16450082b9a01331a478e4e4e10ff8022c5ab29280566d3b70401"
    "dd333211a8d1c01719528a1f24ab1ba6262ce543573aa952731a3bb33f3b5ab43ba65d"
    "499a282815748fd12227af2f0f10b722df312db72e1121b706620f20b7392e16188001"
    "361125412049731c801780cd2803097333c01206df572509733b4d40152f68372cda09"
    "363582e2405a46cd2829171a39363970b8052926a6d51e221a8598740a2086271335dd"
    "1a722049ff1f0941ea020f0176494b200c33c0ffa02b33581f2343665537ba55381517"
    "6f3bcd2d25c03726467c49660122627d622a58685575af525f543559806471652d4b4f"
    "7b2f338051ab0139110547663935293126210d7939491a0155290a438a4d6e5a2f7273"
    "15020a66ffa61706651d100a558065c41a39120a6666d522142b75140f24a38044011a"
    "663d472522351ff3c0453c472649771cde25442d8022012f0bf5ab3e1113469255373e"
    "46252b259a64a355a0013f095c881c4020c9554b0f090940ffb8771056061c0540ff19"
    "f8013808118489ff3774803a0f145287391a7928a4321f899a851923da33672c83837b"
    "1f069e5628408794e02db780161a1183f09a0e01d12d10155b40de0701c53815279b3c"
    "8a1766d5530c0d36c0ff442f1c551a555580802092ab120b073f90ab0404f6231b0a92"
    "aeab0c1a80be502363b4507e362d557e2f57b033291420654b808b769274805538290f"
    "b0ec5525093e471e117776ff11128a65263c8a37462b1a8e9224131eabff611b148a2d"
    "3d3edb0151bc4020291475978e1415a370130c3dc380300418"
), dtype=np.uint8).reshape(10, 10, 9)

# default token probs [4][8][3][11] (RFC 13.5)
DEFAULT_COEF_PROBS = np.frombuffer(_bytes(
    "808080808080808080808080808080808080808080808080808080808080808080fd88"
    "feffe4db8080808080bd81f2ffe3d5ffdb8080806a7ee3fcd6d1ffff8080800162f8ff"
    "ece2ffff808080b585eefeddeaff9a8080804e86caf7c6b4ffdb80808001b9f9fff3ff"
    "8080808080b896f7ffece080808080804d6ed8ffece680808080800165fbfff1ff8080"
    "808080aa8bf1fcecd1ffff8080802574c4f3e4ffffff80808001ccfefff5ff80808080"
    "80cfa0faffee8080808080806667e7ffd3ab80808080800198fcfff0ff8080808080b1"
    "87f3ffeae180808080805081d3ffc2e080808080800101ff8080808080808080f601ff"
    "8080808080808080ff80808080808080808080c623eddfc1bba2a0919b3e832dc6ddac"
    "b0dc9dfcdd01442f92d095a7dda2ffdf800195f1ffdde0ffff808080b88deafddedcff"
    "c78080805163b5f2b0bef9caffff800181e8fdd6c5f2c4ffff806379d2fac9c6ffca80"
    "8080175ba3f2aabbf7d2ffff8001c8f6ffeaff80808080806db2f1ffe7f5ffff808080"
    "2c82c9fdcdc0ffff8080800184effbdbd1ffa58080805e88e1fbdabeffff8080801664"
    "aef5baa1ffc780808001b6f9ffe8eb80808080807c8ff1ffe3ea8080808080234db5fb"
    "c1d3ffcd808080019df7ffece7ffff808080798debffe1e3ffff8080802d63bcfbc3d9"
    "ffe08080800101fbffd5ff8080808080cb01f8ffff8080808080808901b1ffe0ff8080"
    "808080fd09f8fbcfd0ffc0808080af0de0f3c1b9f9c6ffff804911abdda1b3eca7ffea"
    "80015ff7fdd4b7ffff808080ef5af4fad3d1ffff8080809b4dc3f8bcc3ffff80808001"
    "18effbdadbffcd808080c933dbffc4ba8080808080452ebeefc9daffe480808001bffb"
    "ffff808080808080dfa5f9ffd5ff80808080808d7cf8ffff8080808080800110f8ffff"
    "808080808080be24e6ffecff80808080809501ff808080808080808001e2ff80808080"
    "80808080f7c0ff8080808080808080f080ff80808080808080800186fcffff80808080"
    "8080d53efaffff808080808080375dff80808080808080808080808080808080808080"
    "80808080808080808080808080808080808080808080ca18d5ebbabfdca0f0afff7e26"
    "b6e8a9b8e4aeffbb803d2e8adb97b2f0aaffd8800170e6fac7bff79fffff80a66de4fc"
    "d3d7ffae808080274da2e8acb4f5b2ffff800134dcf6c6c7f9dcffff807c4abff3b7c1"
    "faddffff80184782db9aaaf3b6ffff8001b6e1f9dbf0ffe08080809596e2fcd8cdffab"
    "8080801c6caaf2b7c2fedfffff800151e6fccccbffc08080807b66d1f7bcc4ffe98080"
    "80145f99f3a4adffcb80808001def8ffd8d58080808080a8aff6fcebcdffff8080802f"
    "74d7ffd3d4ffff8080800179ecfdd4d6ffff8080808d54d5fcc9caffdb8080802a50a0"
    "f0a2b9ffcd8080800101ff8080808080808080f401ff8080808080808080ee01ff8080"
    "808080808080"
), dtype=np.uint8).reshape(4, 8, 3, 11)
