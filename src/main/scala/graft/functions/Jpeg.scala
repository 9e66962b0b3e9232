package graft.functions

/** Pure-JVM baseline JPEG codec (ITU-T T.81) — the pixel-decode step the
  * round-10 verdict ranked first among engine gaps: headers were real
  * (parseJpegHeader) but any JPEG payload fell back to the disclosed
  * pseudo-metadata stub, so dHash/near-dup over a real-world corpus (JPEG is
  * the dominant image format) would silently fingerprint garbage.
  *
  * Decoder scope — baseline + extended-sequential DCT (SOF0/SOF1), the
  * profile every camera/web encoder emits:
  *   - full marker-segment walk (APPn/COM skipped by declared length)
  *   - multiple DQT/DHT segments, 8-bit quantizers (16-bit refused loudly)
  *   - canonical Huffman decode per T.81 Annex C / F.2.2.3 (mincode /
  *     maxcode / valptr), DC difference categories + EXTEND, AC run/size
  *     with EOB and ZRL
  *   - 1–3 components, sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0)
  *   - restart intervals (DRI + RSTn: bit realign, DC predictor reset,
  *     marker sequence verified)
  *   - dequantize → de-zigzag → separable double-precision IDCT →
  *     level-shift + clamp
  * Progressive (SOF2), arithmetic coding, hierarchical and 12-bit modes
  * refuse loudly — garbage pixels are worse than an exception.
  *
  * The decoder returns the LUMA plane: JPEG's Y channel IS BT.601 luma,
  * the same grayscale view [[Multimodal.decodePngGray]] produces for color
  * PNGs, so every downstream perceptual op (dHash, near-dup bands) is
  * format-agnostic. Chroma blocks are entropy-decoded (the bit stream
  * demands it) but skip IDCT — the luma view never reads them.
  *
  * Encoder scope — [[encodeGrayDcOnly]] writes REAL baseline JPEGs
  * (standard Annex K DC luminance Huffman table, canonical code build,
  * byte stuffing, optional per-tile-row restart markers) whose blocks
  * carry only DC coefficients with Q(0,0)=8: the IDCT of a DC-only block
  * is analytically flat (pixel = 128 + DC·Q/8 exactly), which is what
  * lets a DuckDB oracle derive expected pixels ARITHMETICALLY while the
  * Spark side earns them through the full marker-walk → Huffman →
  * dequant → IDCT byte path (q35j). Any codec bug — wrong canonical
  * codes, off-by-one in stuffing, predictor reset, zigzag, IDCT scale —
  * hash-mismatches the gate.
  */
object Jpeg {

  // ---- shared tables ------------------------------------------------------

  /** Zigzag index k → natural (row-major) position, T.81 Figure A.6. */
  private val ZigzagToNatural: Array[Int] = {
    val m = new Array[Int](64)
    var k = 0
    var x = 0; var y = 0; var up = true
    while (k < 64) {
      m(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      k += 1
    }
    m
  }

  /** cos((2x+1)·u·π/16) — the 1-D IDCT basis, precomputed. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Standard DC luminance Huffman spec, T.81 Annex K.3.1: BITS[1..16] and
    * HUFFVAL (categories 0..11) — the table every baseline encoder ships.
    */
  private val StdDcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0) // index 1..16
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  // ---- Huffman ------------------------------------------------------------

  /** Canonical decode tables per T.81 F.2.2.3. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    }
  }

  /** Canonical (code, length) per value — the encoder-side view. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { out += vals(k) -> (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out.result()
  }

  // ---- bit reader over the entropy-coded segment --------------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0

    def nextBit(): Int = {
      if (cnt == 0) {
        require(pos < b.length, "entropy stream truncated")
        val v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          require(pos < b.length, "entropy stream truncated after FF")
          val m = b(pos) & 0xFF
          require(m == 0x00,
            f"unexpected marker FF$m%02X inside entropy-coded data")
          pos += 1 // stuffed zero byte
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker (T.81 E.1.4). */
    def expectRestart(n: Int): Unit = {
      cnt = 0
      require(pos + 1 < b.length, "truncated at restart marker")
      val ok = (b(pos) & 0xFF) == 0xFF && (b(pos + 1) & 0xFF) == (0xD0 + n)
      require(ok, f"expected RST$n at $pos, got " +
        f"${b(pos) & 0xFF}%02X${b(pos + 1) & 0xFF}%02X")
      pos += 2
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        code = (code << 1) | nextBit()
        l += 1
        if (t.maxcode(l) >= 0 && code <= t.maxcode(l))
          return t.values(t.valptr(l) + code - t.mincode(l))
      }
      throw new IllegalArgumentException("invalid Huffman code (>16 bits)")
    }
  }

  /** EXTEND, T.81 F.2.2.1: map a t-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- decoder ------------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  /** Per-component coefficient storage for the unified (sequential +
    * progressive) decoder: one lazily-allocated 64-int array per 8×8
    * block, indexed on the MCU-PADDED block grid, coefficients kept in
    * ZIGZAG order UNQUANTIZED until finalize (progressive scans update
    * zigzag bands in place; dequant+IDCT happen once at EOI).
    */
  private final class CompCoefs(val c: Component, hmax: Int, vmax: Int,
      w: Int, h: Int) {
    val mcusX: Int = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (h + 8 * vmax - 1) / (8 * vmax)
    val padW: Int = mcusX * c.h // block columns, MCU-padded
    val padH: Int = mcusY * c.v
    // non-interleaved (single-component) scan geometry, T.81 A.2.2
    val compW: Int = (w * c.h + hmax - 1) / hmax
    val compH: Int = (h * c.v + vmax - 1) / vmax
    val blocksW: Int = (compW + 7) / 8
    val blocksH: Int = (compH + 7) / 8
    private val blocks = new Array[Array[Int]](padW * padH)
    def block(row: Int, col: Int): Array[Int] = {
      val i = row * padW + col
      if (blocks(i) == null) blocks(i) = new Array[Int](64)
      blocks(i)
    }
    def blockOrNull(row: Int, col: Int): Array[Int] = blocks(row * padW + col)
  }

  /** Decode a baseline / extended-sequential / PROGRESSIVE JPEG
    * (SOF0/SOF1/SOF2) to its luma plane (`h × w`, values 0–255).
    * Sequential is the single-scan special case (Ss=0, Se=63, Ah=Al=0) of
    * the progressive band machinery (T.81 G.2): every scan accumulates
    * unquantized zigzag coefficients into per-block buffers; dequant +
    * IDCT run once at EOI. Progressive AC scans are single-component by
    * spec — chroma-only scans are SKIPPED (entropy bytes scanned to the
    * next marker without decode), since the luma view never reads them.
    * Arithmetic coding, hierarchical, lossless and 12-bit modes refuse
    * loudly — garbage pixels are worse than an exception.
    */
  def decodeGray(b: Array[Byte]): Array[Array[Int]] = {
    require(b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
      "not a JPEG (no SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var store: Array[CompCoefs] = null
    var w = -1; var h = -1
    var hmax = 1; var vmax = 1
    var restartInterval = 0
    var sawScan = false
    var off = 2

    def be16(o: Int) = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

    while (off + 2 <= b.length) {
      require((b(off) & 0xFF) == 0xFF, f"expected marker at $off")
      val marker = b(off + 1) & 0xFF
      if (marker == 0xD8) { off += 2 } // stray SOI
      else if (marker == 0xD9) { // EOI: finalize
        require(sawScan, "EOI before SOS")
        return finalizeLuma(store, quant, w, h, hmax)
      }
      else {
        require(off + 4 <= b.length, "truncated JPEG")
        val len = be16(off + 2)
        require(len >= 2 && off + 2 + len <= b.length, f"corrupt segment $marker%02X")
        val seg = off + 4
        var nextOff = off + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < off + 2 + len) {
              val pq = (b(p) & 0xFF) >> 4; val tq = b(p) & 0x0F
              require(pq == 0, "16-bit quantizers unsupported (baseline is 8-bit)")
              quant(tq) = Array.tabulate(64)(i => b(p + 1 + i) & 0xFF)
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < off + 2 + len) {
              val tc = (b(p) & 0xFF) >> 4; val th = b(p) & 0x0F
              val bits = new Array[Int](17)
              var n = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xFF; n += bits(l); l += 1 }
              val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xFF)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 sequential, SOF2 progressive
            require(comps == null, "multiple SOF markers")
            require((b(seg) & 0xFF) == 8, "only 8-bit precision supported")
            h = be16(seg + 1); w = be16(seg + 3)
            val n = b(seg + 5) & 0xFF
            require(n >= 1 && n <= 3, s"unsupported component count $n")
            comps = Array.tabulate(n) { i =>
              val o = seg + 6 + i * 3
              val hv = b(o + 1) & 0xFF
              Component(b(o) & 0xFF, hv >> 4, hv & 0x0F, b(o + 2) & 0xFF)
            }
            comps.foreach(c => require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling factors ${c.h}x${c.v} unsupported (1-2 only)"))
            hmax = comps.map(_.h).max; vmax = comps.map(_.v).max
            require(comps.head.h == hmax && comps.head.v == vmax,
              "luma must carry the max sampling factor")
            store = comps.map(new CompCoefs(_, hmax, vmax, w, h))
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD |
               0xCE | 0xCF =>
            throw new IllegalArgumentException(
              f"SOF$marker%02X (lossless/hierarchical/arithmetic) unsupported")
          case 0xDD => restartInterval = be16(seg)
          case 0xDA => // SOS: one scan (of possibly many)
            require(comps != null, "SOS before SOF")
            val ns = b(seg) & 0xFF
            require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
            // MCU interleave follows the SOS component ORDER (T.81 B.2.3)
            val scanComps = Array.tabulate(ns) { i =>
              val cs = b(seg + 1 + i * 2) & 0xFF
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"SOS names unknown component $cs"))
              c.dcTable = (b(seg + 2 + i * 2) & 0xFF) >> 4
              c.acTable = b(seg + 2 + i * 2) & 0x0F
              c
            }
            val ss = b(seg + 1 + ns * 2) & 0xFF
            val se = b(seg + 2 + ns * 2) & 0xFF
            val ahAl = b(seg + 3 + ns * 2) & 0xFF
            val ah = ahAl >> 4; val al = ahAl & 0x0F
            require(ss <= se && se <= 63, s"bad spectral band $ss..$se")
            val start = off + 2 + len
            sawScan = true
            nextOff =
              if (ns == 1 && !(scanComps(0) eq comps.head))
                // chroma-only scan: the luma view never reads it — skip the
                // entropy bytes without decoding
                skipEntropy(b, start)
              else
                decodeScanInto(b, start, scanComps.map(c =>
                  store(comps.indexWhere(_ eq c))), store(0),
                  dcTables, acTables, restartInterval, ss, se, ah, al)
          case m if m >= 0xD0 && m <= 0xD7 =>
            throw new IllegalArgumentException("RST marker outside entropy data")
          case _ => () // APPn / COM / others: skip by length
        }
        off = nextOff
      }
    }
    // ran off the end without EOI: decode what the scans produced — the
    // sequential single-scan case here matches the old at-SOS-return
    // behavior on EOI-stripped files; a truncation INSIDE entropy data
    // still throws in the BitReader
    if (sawScan) return finalizeLuma(store, quant, w, h, hmax)
    throw new IllegalArgumentException("no SOS marker — truncated JPEG")
  }

  /** Advance past entropy-coded bytes to the next true marker (FF followed
    * by neither a stuffed 00 nor an RSTn).
    */
  private def skipEntropy(b: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 1 < b.length) {
      if ((b(p) & 0xFF) == 0xFF) {
        val m = b(p + 1) & 0xFF
        if (m != 0x00 && !(m >= 0xD0 && m <= 0xD7)) return p
        p += 2
      } else p += 1
    }
    b.length // no further marker: stream ends here (missing-EOI leniency)
  }

  /** Decode ONE scan's entropy data into the coefficient stores (T.81 F.2
    * sequential / G.2 progressive — the sequential case is Ss=0, Se=63,
    * Ah=Al=0). Returns the offset of the marker following the scan.
    */
  private def decodeScanInto(b: Array[Byte], start: Int,
      scan: Array[CompCoefs], lumaStore: CompCoefs, dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    val br = new BitReader(b, start)
    val pred = new Array[Int](scan.length)
    // chroma blocks are entropy-decoded only to keep the bit stream in
    // sync — finalizeLuma never reads them, so they decode into ONE shared
    // scratch block instead of retaining ~2x the luma footprint until EOI.
    // Safe because every stream-consumption decision in the scan kinds
    // that can be interleaved (DC scans, sequential full-band scans) is
    // independent of stored coefficient STATE; AC refinement — whose bit
    // consumption DOES depend on prior coefficients — is single-component
    // by spec, and single-component chroma scans are skipped entirely.
    val chromaScratch = new Array[Int](64)
    var eobrun = 0
    var restLeft = if (restartInterval > 0) restartInterval else Int.MaxValue
    var rstIdx = 0
    val interleaved = scan.length > 1
    // defense for the scratch-block argument above
    require(!(ah > 0 && ss > 0) || scan.length == 1,
      "progressive AC scans must be single-component (T.81 G.1)")

    // total MCU count: interleaved = image MCU grid; single-component =
    // that component's own block grid (T.81 A.2.2)
    val (mcusX, mcusY) =
      if (interleaved) (scan(0).mcusX, scan(0).mcusY)
      else (scan(0).blocksW, scan(0).blocksH)

    def decodeDc(st: CompCoefs, ci: Int, coef: Array[Int]): Unit =
      if (ah == 0) {
        val dc = dcTables(st.c.dcTable)
        require(dc != null, "scan references missing DC DHT")
        val t = br.decodeHuff(dc)
        require(t <= 11, s"DC category $t out of range")
        pred(ci) += extend(br.receive(t), t)
        coef(0) = pred(ci) << al
      } else {
        // successive-approximation refinement: next lower bit of the
        // two's-complement DC (G.1.2.1)
        if (br.nextBit() == 1) coef(0) |= (1 << al)
      }

    def decodeAcFirst(st: CompCoefs, coef: Array[Int]): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val ac = acTables(st.c.acTable)
      require(ac != null, "scan references missing AC DHT")
      var k = math.max(ss, 1)
      while (k <= se) {
        val rs = br.decodeHuff(ac)
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else { // EOBn: this block ends; (2^r - 1 + ext) more follow empty
            eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
            k = 64
          }
        } else {
          k += r
          require(k <= se, "AC run past band end")
          coef(k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    /** AC successive-approximation refinement (G.1.2.3): new ±1·2^Al
      * insertions interleaved with one correction bit per already-nonzero
      * coefficient traversed — including through ZRL runs and EOB runs.
      */
    def decodeAcRefine(st: CompCoefs, coef: Array[Int]): Unit = {
      val ac = acTables(st.c.acTable)
      require(ac != null, "scan references missing AC DHT")
      val p1 = 1 << al
      def correct(k: Int): Unit =
        if (br.nextBit() == 1 && (math.abs(coef(k)) & p1) == 0)
          coef(k) += (if (coef(k) > 0) p1 else -p1)
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = br.decodeHuff(ac)
          var r = rs >> 4; val s = rs & 0x0F
          var newVal = 0
          if (s == 0) {
            if (r != 15) { // EOBn begins; band tail handled below
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              ended = true
            } // r == 15: ZRL — skip 16 zero-history positions
          } else {
            require(s == 1, s"AC refinement size $s (must be 1)")
            newVal = if (br.nextBit() == 1) p1 else -p1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              if (coef(k) != 0) correct(k)
              else if (r == 0) { if (newVal != 0) coef(k) = newVal; placed = true }
              else r -= 1
              k += 1
            }
            require(placed || k > se, "refinement run past band end")
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) { if (coef(k) != 0) correct(k); k += 1 }
        eobrun -= 1
      }
    }

    def decodeBlock(st: CompCoefs, ci: Int, row: Int, col: Int): Unit = {
      val coef =
        if (st eq lumaStore) st.block(row, col)
        else { java.util.Arrays.fill(chromaScratch, 0); chromaScratch }
      if (ss == 0) {
        decodeDc(st, ci, coef)
        // sequential full-band scan (Se=63): AC follows DC in-block — the
        // same run/size machinery as a progressive first scan at Al=0
        if (se > 0) decodeAcFirst(st, coef)
      } else if (ah == 0) decodeAcFirst(st, coef)
      else decodeAcRefine(st, coef)
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (interleaved) {
          var ci = 0
          while (ci < scan.length) {
            val st = scan(ci)
            var by = 0
            while (by < st.c.v) {
              var bx = 0
              while (bx < st.c.h) {
                decodeBlock(st, ci, my * st.c.v + by, mx * st.c.h + bx)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
        } else decodeBlock(scan(0), 0, my, mx)
        restLeft -= 1
        if (restLeft == 0 && !(my == mcusY - 1 && mx == mcusX - 1)) {
          br.expectRestart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
          restLeft = restartInterval
        }
        mx += 1
      }
      my += 1
    }
    skipEntropy(b, br.pos)
  }

  /** Dequantize + de-zigzag + IDCT the LUMA component's coefficient
    * buffers into the output plane — run once, at EOI.
    */
  private def finalizeLuma(store: Array[CompCoefs], quant: Array[Array[Int]],
      w: Int, h: Int, hmax: Int): Array[Array[Int]] = {
    require(store != null, "no SOF before EOI")
    val luma = store(0)
    val q = quant(luma.c.tq)
    require(q != null, "luma references missing DQT")
    val planeW = luma.padW * 8
    val plane = new Array[Int](planeW * luma.padH * 8)
    val natural = new Array[Int](64)
    var row = 0
    while (row < luma.padH) {
      var col = 0
      while (col < luma.padW) {
        val coef = luma.blockOrNull(row, col)
        if (coef == null)
          java.util.Arrays.fill(natural, 0) // untouched block: flat 128
        else {
          var k = 0
          while (k < 64) { natural(ZigzagToNatural(k)) = coef(k) * q(k); k += 1 }
        }
        idctInto(natural, plane, planeW, col * 8, row * 8)
        col += 1
      }
      row += 1
    }
    Array.tabulate(h, w)((y, x) => plane(y * planeW + x))
  }

  /** Separable 2-D IDCT (T.81 A.3.3) in doubles, rounded + level-shifted +
    * clamped into the plane. For a DC-only block the result is exactly
    * flat — the property q35j's oracle leans on.
    */
  private def idctInto(coef: Array[Int], plane: Array[Int], planeW: Int,
      px: Int, py: Int): Unit = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // rows: g(x, v) = 1/2 Σ_u C(u) F(u,v) cos((2x+1)uπ/16)
      var v = 0
      while (v < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val f = coef(u * 8 + v)
          if (f != 0) s += (if (u == 0) InvSqrt2 else 1.0) * f * CosT(x)(u)
          u += 1
        }
        tmp(x * 8 + v) = 0.5 * s
        v += 1
      }
      x += 1
    }
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val g = tmp(yy * 8 + v)
          if (g != 0.0) s += (if (v == 0) InvSqrt2 else 1.0) * g * CosT(xx)(v)
          v += 1
        }
        val p = math.round(0.5 * s).toInt + 128
        plane((py + yy) * planeW + px + xx) =
          if (p < 0) 0 else if (p > 255) 255 else p
        xx += 1
      }
      yy += 1
    }
  }

  // ---- DC-only encoder (gate synthesis) -----------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) { put(0xFF, 8 - cnt); () }
  }

  /** Encode `tiles(ty)(tx)` (values in [-128, 127]) as a real baseline
    * grayscale JPEG of `8·tilesH × 8·tilesW` pixels where every 8×8 block
    * carries ONLY the DC coefficient `tile · (8 / Q00) = tile` with
    * Q(0,0) = 8 — decoded pixel = 128 + tile, exactly. With
    * `restartPerRow` a DRI segment sets the restart interval to one tile
    * row: RSTn markers separate rows and DC predictors reset — the
    * restart machinery a long scan depends on, exercised end-to-end.
    */
  def encodeGrayDcOnly(tiles: Array[Array[Int]],
      restartPerRow: Boolean = true): Array[Byte] = {
    val tilesH = tiles.length
    val tilesW = tiles(0).length
    val h = tilesH * 8; val w = tilesW * 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    marker(0xDB); u16(67); u8(0x00) // DQT table 0, 8-bit
    u8(8) // Q(0,0) = 8: DC dequant lands on exact eighths
    var i = 1
    while (i < 64) { u8(16); i += 1 } // AC quantizers unused (no AC coefs)
    marker(0xC0); u16(11); u8(8); u16(h); u16(w) // SOF0, 1 component
    u8(1); u8(1); u8(0x11); u8(0) // id 1, 1x1 sampling, quant table 0
    // DHT: standard Annex K DC luminance table (class 0, id 0)
    marker(0xC4); u16(2 + 1 + 16 + StdDcVals.length); u8(0x00)
    i = 1
    while (i <= 16) { u8(StdDcBits(i)); i += 1 }
    StdDcVals.foreach(u8)
    // DHT: minimal AC table (class 1, id 0) — single 1-bit code for EOB
    marker(0xC4); u16(2 + 1 + 16 + 1); u8(0x10)
    u8(1); i = 2
    while (i <= 16) { u8(0); i += 1 }
    u8(0x00) // the lone value: run 0 / size 0 = EOB
    if (restartPerRow) { marker(0xDD); u16(4); u16(tilesW) } // DRI: one tile row
    marker(0xDA); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0) // SOS
    val dcCodes = canonicalCodes(StdDcBits, StdDcVals)
    var bw = new BitWriter(out)
    var pred = 0
    var rstIdx = 0
    var ty = 0
    while (ty < tilesH) {
      var tx = 0
      while (tx < tilesW) {
        val dc = tiles(ty)(tx)
        val diff = dc - pred
        pred = dc
        var cat = 0
        var m = math.abs(diff)
        while (m > 0) { cat += 1; m >>= 1 }
        val (code, len) = dcCodes(cat)
        bw.put(code, len)
        if (cat > 0)
          bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        bw.put(0, 1) // EOB (our 1-bit AC code): no AC coefficients
        tx += 1
      }
      if (restartPerRow && ty < tilesH - 1) {
        bw.flush()
        marker(0xD0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        bw = new BitWriter(out)
        pred = 0
      }
      ty += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE twin of [[encodeGrayDcOnly]]: the same DC-only tile
    * semantics (decoded pixel = 128 + tile, exactly) emitted as a real
    * SOF2 multi-scan stream —
    *
    *   1. DC first scan (Ah=0, Al=1): differences of `tile >> 1`
    *      (arithmetic shift — T.81 G.1.2.1's point transform),
    *   2. DC refinement (Ah=1, Al=0): the two's-complement low bit of
    *      each tile, one raw bit per block,
    *   3. AC first scan (Ss=1..63): a single greedy chain of EOBn codes
    *      spanning every block — the EOB-run machinery end-to-end.
    *
    * Reconstruction: `((tile >> 1) << 1) | (tile & 1) = tile` for both
    * signs, so the q35k oracle reuses q35j's tile algebra unchanged while
    * the engine earns the pixels through the successive-approximation
    * byte path.
    */
  def encodeGrayDcOnlyProgressive(tiles: Array[Array[Int]]): Array[Byte] = {
    val tilesH = tiles.length
    val tilesW = tiles(0).length
    val h = tilesH * 8; val w = tilesW * 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    marker(0xDB); u16(67); u8(0x00) // DQT table 0, 8-bit
    u8(8) // Q(0,0) = 8
    var i = 1
    while (i < 64) { u8(16); i += 1 }
    marker(0xC2); u16(11); u8(8); u16(h); u16(w) // SOF2, 1 component
    u8(1); u8(1); u8(0x11); u8(0)
    // DHT: standard Annex K DC luminance table (class 0, id 0)
    marker(0xC4); u16(2 + 1 + 16 + StdDcVals.length); u8(0x00)
    i = 1
    while (i <= 16) { u8(StdDcBits(i)); i += 1 }
    StdDcVals.foreach(u8)
    // DHT: AC table (class 1, id 0) with codes for every EOBn rs = r<<4
    // (15 values, all length 4 — canonical within the 16-slot 4-bit space)
    val acVals = Array.tabulate(15)(r => r << 4)
    marker(0xC4); u16(2 + 1 + 16 + acVals.length); u8(0x10)
    u8(0); u8(0); u8(0); u8(15); i = 5
    while (i <= 16) { u8(0); i += 1 }
    acVals.foreach(u8)
    val dcCodes = canonicalCodes(StdDcBits, StdDcVals)
    val acBits = Array(0, 0, 0, 0, 15) ++ Array.fill(12)(0)
    val acCodes = canonicalCodes(acBits, acVals)

    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xDA); u16(8); u8(1); u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
    }

    // scan 1: DC first, Al = 1
    sos(0, 0, 0, 1)
    var bw = new BitWriter(out)
    var pred = 0
    var ty = 0
    while (ty < tilesH) {
      var tx = 0
      while (tx < tilesW) {
        val v = tiles(ty)(tx) >> 1 // arithmetic: G.1.2.1 point transform
        val diff = v - pred
        pred = v
        var cat = 0
        var m = math.abs(diff)
        while (m > 0) { cat += 1; m >>= 1 }
        val (code, len) = dcCodes(cat)
        bw.put(code, len)
        if (cat > 0)
          bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        tx += 1
      }
      ty += 1
    }
    bw.flush()

    // scan 2: DC refinement, Ah = 1, Al = 0 — one raw bit per block
    sos(0, 0, 1, 0)
    bw = new BitWriter(out)
    ty = 0
    while (ty < tilesH) {
      var tx = 0
      while (tx < tilesW) { bw.put(tiles(ty)(tx) & 1, 1); tx += 1 }
      ty += 1
    }
    bw.flush()

    // scan 3: AC 1..63 — every block empty, spanned by greedy EOBn runs
    sos(1, 63, 0, 0)
    bw = new BitWriter(out)
    var left = tilesH * tilesW
    while (left > 0) {
      var r = 0
      while (r < 14 && (1 << (r + 1)) <= left) r += 1
      val run = math.min(left, (1 << r) + (1 << r) - 1)
      val (code, len) = acCodes(r << 4)
      bw.put(code, len)
      if (r > 0) bw.put(run - (1 << r), r)
      left -= run
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }
}
