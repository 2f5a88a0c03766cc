package graft.functions

/** Library-free baseline JPEG codec — the dominant real-world image format
  * for the multimodal ingest leg (reference analog: the binary→content
  * pathway of src/pdf-extractor.ts, same pattern as [[Png]] for the
  * lossless format). Everything here is ITU-T T.81 (the public JPEG spec):
  * marker walk, DQT/DHT/SOF0/SOS/DRI parsing, canonical Huffman decoding
  * (F.16), DC prediction with EXTEND (F.12), dequantize + dezigzag,
  * separable floating IDCT, replication chroma upsample, JFIF YCbCr→RGB.
  *
  * Scope: BASELINE sequential DCT (SOF0; SOF1 extended-sequential decodes
  * identically at 8-bit and is accepted), 8-bit precision, 1 (gray) or
  * 3 (YCbCr — or RGB when an Adobe APP14 says transform 0) components,
  * sampling factors 1/2/4 (4:4:4, 4:2:2, 4:2:0, …), restart intervals,
  * fully interleaved single-scan files (what every baseline encoder
  * emits). Progressive (SOF2), arithmetic coding (SOF9+), lossless,
  * hierarchical, 12-bit, and multi-scan non-interleaved files return None
  * (degrade, never throw) like [[Png]]'s out-of-scope forms.
  *
  * The encoder exists for the oracle story ([[Png.encode]]'s role): fixed
  * Annex-K quantization tables scaled by `quality`, the Annex-K typical
  * Huffman tables, optional 4:2:0 subsampling and restart intervals —
  * deterministic bytes (StrictMath tables), so an in-plan encode→decode is
  * run-stable and the decoded stats can be pinned as oracle literals.
  * JPEG is lossy, so unlike PNG the gate pins the CODEC'S OUTPUT for
  * fixed input bytes, not a round-trip identity; cross-validation against
  * an independent decoder (javax.imageio) lives in JpegSpec.
  */
object Jpeg {

  import Png.Image // (width, height, channels, row-major interleaved bytes)

  /** 256 MPix ceiling, [[Png]]'s allocation-bomb guard. */
  private val MaxPixels = 256L << 20

  // zigzag position k → natural-order index (T.81 Figure 5)
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // c(u,x) = C(u)/2 · cos((2x+1)uπ/16) — the orthonormal 8-point DCT
  // basis; StrictMath so the tables (and every encode/decode bit) are
  // identical across JVMs/platforms, the determinism the oracle pins
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    cu / 2.0 * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], val huffval: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally { // T.81 F.15 decoder tables from the canonical (BITS, HUFFVAL) pair
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k; mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader: 0xFF00 byte-stuffing unstuffed, any
    * other marker stops the stream (markerHit carries it — restart handling
    * consumes RSTn and resumes).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var markerHit: Int = -1
    def bit(): Int = {
      if (bitCnt == 0 && !fill()) return -1
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    private def fill(): Boolean = {
      if (markerHit >= 0 || pos >= data.length) return false
      val b = data(pos) & 0xff
      if (b == 0xff) {
        if (pos + 1 >= data.length) return false
        val b2 = data(pos + 1) & 0xff
        if (b2 == 0) pos += 2
        else { markerHit = b2; return false }
      } else pos += 1
      bitBuf = b; bitCnt = 8; true
    }
    /** RECEIVE (F.17): n bits as an unsigned int; Int.MinValue on starve. */
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Consume an expected RSTn and resume on the byte boundary. */
    def consumeRestart(expected: Int): Boolean = {
      bitCnt = 0
      // the marker may not have been reached yet (padding bits consumed it)
      if (markerHit < 0) { while (markerHit < 0 && bit() >= 0) () }
      if (markerHit != expected) return false
      pos += 2; markerHit = -1; true
    }
  }

  /** DECODE (F.16): one Huffman symbol; -1 on starve/invalid. */
  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit(); if (code < 0) return -1
    var l = 1
    while (code > t.maxcode(l)) {
      val b = br.bit(); if (b < 0) return -1
      code = (code << 1) | b
      l += 1
      if (l > 16) return -1
    }
    val idx = t.valptr(l) + code - t.mincode(l)
    if (idx < 0 || idx >= t.huffval.length) -1 else t.huffval(idx)
  }

  /** EXTEND (F.12). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = 0
    var ta: Int = 0
  }

  /** Decode baseline JPEG bytes to an interleaved 8-bit raster. None on
    * anything malformed or out of scope — the corrupt-stream degrade path.
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var p = 2
    val qt = new Array[Array[Int]](4)
    val dcTbl = new Array[HuffTable](4)
    val acTbl = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var adobeTransform = -1 // APP14: 0 = components are straight RGB
    var prog: ProgState = null // non-null after SOF2
    def be16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    while (p < bytes.length) {
      // tolerate fill bytes between markers (T.81 B.1.1.2)
      while (p < bytes.length && (bytes(p) & 0xff) == 0xff &&
        p + 1 < bytes.length && (bytes(p + 1) & 0xff) == 0xff) p += 1
      if (p + 2 > bytes.length || (bytes(p) & 0xff) != 0xff) return None
      val marker = bytes(p + 1) & 0xff
      p += 2
      marker match {
        case 0xd9 => // EOI: progressive reconstructs here; baseline = nothing decoded
          return if (prog != null && prog.complete)
            reconstructProgressive(prog, qt, adobeTransform)
          else None
        case 0x01 => () // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, standalone
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          if (p + 2 > bytes.length) return None
          val len = be16(p)
          if (p + len > bytes.length || len < 8) return None
          val prec = bytes(p + 2) & 0xff
          h = be16(p + 3); w = be16(p + 5)
          val nf = bytes(p + 7) & 0xff
          if (prec != 8 || w <= 0 || h <= 0) return None
          if (nf != 1 && nf != 3) return None
          if (w.toLong * h * nf > MaxPixels) return None
          if (len != 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = p + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, hv >> 4, hv & 15, bytes(o + 2) & 0xff)
          }
          // single-component scans have one data unit per MCU regardless of
          // declared factors (T.81 A.2.2) — normalize so the MCU walk holds
          if (nf == 1) comps = Array(comps(0).copy(h = 1, v = 1))
          if (comps.exists(c => !Set(1, 2, 4).contains(c.h) ||
            !Set(1, 2, 4).contains(c.v) || c.tq > 3)) return None
          p += len
        case 0xc2 => // SOF2 progressive (r18) — multi-scan coefficient build
          if (p + 2 > bytes.length) return None
          val len = be16(p)
          if (p + len > bytes.length || len < 8) return None
          val prec = bytes(p + 2) & 0xff
          h = be16(p + 3); w = be16(p + 5)
          val nf = bytes(p + 7) & 0xff
          if (prec != 8 || w <= 0 || h <= 0) return None
          if (nf != 1 && nf != 3) return None
          // tighter allocation bomb guard than baseline: progressive holds
          // EVERY coefficient as an Int until EOI (4 bytes/sample)
          if (w.toLong * h * nf > MaxPixels / 8) return None
          if (len != 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = p + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, hv >> 4, hv & 15, bytes(o + 2) & 0xff)
          }
          if (nf == 1) comps = Array(comps(0).copy(h = 1, v = 1))
          if (comps.exists(c => !Set(1, 2, 4).contains(c.h) ||
            !Set(1, 2, 4).contains(c.v) || c.tq > 3)) return None
          prog = new ProgState(comps, w, h)
          p += len
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // lossless / arithmetic / hierarchical: out of scope
        case 0xdb => // DQT
          if (p + 2 > bytes.length) return None
          val len = be16(p); val end = p + len
          if (end > bytes.length) return None
          var q = p + 2
          while (q < end) {
            val pq = (bytes(q) & 0xff) >> 4
            val tq = bytes(q) & 15
            if (pq != 0 || tq > 3 || q + 65 > end) return None // 8-bit only
            // DQT serializes in zigzag order; store natural-order
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = bytes(q + 1 + i) & 0xff; i += 1 }
            qt(tq) = t
            q += 65
          }
          p = end
        case 0xc4 => // DHT
          if (p + 2 > bytes.length) return None
          val len = be16(p); val end = p + len
          if (end > bytes.length) return None
          var q = p + 2
          while (q < end) {
            val tc = (bytes(q) & 0xff) >> 4
            val th = bytes(q) & 15
            if (tc > 1 || th > 3 || q + 17 > end) return None
            val bits = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val n = bits.sum
            if (n > 256 || q + 17 + n > end) return None
            val vals = Array.tabulate(n)(i => bytes(q + 17 + i) & 0xff)
            val tbl = new HuffTable(bits, vals)
            if (tc == 0) dcTbl(th) = tbl else acTbl(th) = tbl
            q += 17 + n
          }
          p = end
        case 0xdd => // DRI
          if (p + 4 > bytes.length || be16(p) != 4) return None
          restartInterval = be16(p + 2)
          p += 4
        case 0xee => // APP14 (Adobe): transform flag
          if (p + 2 > bytes.length) return None
          val len = be16(p)
          if (p + len > bytes.length) return None
          if (len >= 14 && new String(bytes, p + 2, 5, "ISO-8859-1") == "Adobe")
            adobeTransform = bytes(p + len - 1) & 0xff
          p += len
        case 0xda if prog != null => // progressive SOS: one scan, keep walking
          decodeProgScan(bytes, p, prog, dcTbl, acTbl, restartInterval) match {
            case Some(next) => p = next
            case None => return None
          }
        case 0xda => // SOS — decode the scan and finish
          if (comps == null) return None
          if (p + 2 > bytes.length) return None
          val len = be16(p)
          if (p + len > bytes.length) return None
          val ns = bytes(p + 2) & 0xff
          if (ns != comps.length) return None // non-interleaved: out of scope
          var i = 0
          while (i < ns) {
            val cid = bytes(p + 3 + 2 * i) & 0xff
            val tt = bytes(p + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.td = tt >> 4; c.ta = tt & 15
            if (c.td > 3 || c.ta > 3) return None
            i += 1
          }
          // baseline spectral params: Ss=0, Se=63, Ah=Al=0
          val so = p + 3 + 2 * ns
          if (so + 3 > bytes.length) return None
          if ((bytes(so) & 0xff) != 0 || (bytes(so + 1) & 0xff) != 63 ||
            (bytes(so + 2) & 0xff) != 0) return None
          return decodeScan(bytes, p + len, comps, w, h, qt, dcTbl, acTbl,
            restartInterval, adobeTransform)
        case _ => // APPn / COM / anything else with a length: skip
          if (p + 2 > bytes.length) return None
          val len = be16(p)
          if (len < 2 || p + len > bytes.length) return None
          p += len
      }
    }
    None // no SOS reached
  }

  // ------------------------------------------------------- progressive (r18)

  /** Whole-image coefficient state across a progressive stream's scans
    * (ITU-T T.81 G.1.2): one Int per coefficient, ZIGZAG-index order per
    * block, blocks on the PADDED interleaved grid (non-interleaved scans
    * walk the component's own ceil grid — a prefix of the padded one).
    */
  private final class ProgState(val comps: Array[Component], val w: Int, val h: Int) {
    val hmax: Int = comps.map(_.h).max
    val vmax: Int = comps.map(_.v).max
    val mcusX: Int = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (h + 8 * vmax - 1) / (8 * vmax)
    val bw: Array[Int] = comps.map(c => mcusX * c.h)
    val bh: Array[Int] = comps.map(c => mcusY * c.v)
    // non-interleaved grid (T.81 A.2.2): blocks of ceil(comp dims / 8)
    val bwN: Array[Int] = comps.map(c => ((w * c.h + hmax - 1) / hmax + 7) / 8)
    val bhN: Array[Int] = comps.map(c => ((h * c.v + vmax - 1) / vmax + 7) / 8)
    val coefs: Array[Array[Int]] =
      comps.indices.map(i => new Array[Int](bw(i) * bh(i) * 64)).toArray
    // a renderable stream needs at least the DC first pass of every
    // component; AC-less components reconstruct flat (valid partial scans)
    val dcSeen: Array[Boolean] = new Array[Boolean](comps.length)
    def complete: Boolean = dcSeen.forall(identity)
  }

  /** One progressive scan: parses the SOS header at `p` (length field
    * first), mutates `st.coefs`, and returns the position of the next
    * marker's 0xFF. None = malformed/starved (whole decode degrades).
    */
  private def decodeProgScan(bytes: Array[Byte], p: Int, st: ProgState,
                             dcTbl: Array[HuffTable], acTbl: Array[HuffTable],
                             restartInterval: Int): Option[Int] = {
    def be16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    if (p + 2 > bytes.length) return None
    val len = be16(p)
    if (p + len > bytes.length || len < 6) return None
    val ns = bytes(p + 2) & 0xff
    if (ns < 1 || ns > st.comps.length || len != 6 + 2 * ns) return None
    val sel = new Array[Int](ns) // component indices in scan order
    var i = 0
    while (i < ns) {
      val cid = bytes(p + 3 + 2 * i) & 0xff
      val ciIdx = st.comps.indexWhere(_.id == cid)
      if (ciIdx < 0) return None
      val tt = bytes(p + 4 + 2 * i) & 0xff
      st.comps(ciIdx).td = tt >> 4; st.comps(ciIdx).ta = tt & 15
      if (st.comps(ciIdx).td > 3 || st.comps(ciIdx).ta > 3) return None
      sel(i) = ciIdx
      i += 1
    }
    val so = p + 3 + 2 * ns
    val ss = bytes(so) & 0xff
    val se = bytes(so + 1) & 0xff
    val ahAl = bytes(so + 2) & 0xff
    val ah = ahAl >> 4; val al = ahAl & 15
    val dcScan = ss == 0
    if (dcScan && se != 0) return None // DC and AC never share a scan
    if (!dcScan && (se < ss || se > 63 || ns != 1)) return None // AC: single comp
    if (al > 13 || ah > 13) return None
    val refine = ah != 0
    val br = new BitReader(bytes, p + len)
    val dcPred = new Array[Int](st.comps.length)
    var eobrun = 0
    val p1 = 1 << al

    // ---- per-data-unit decoders (T.81 G.1.2.1 / G.1.2.2 / G.1.2.3)
    def dcUnit(ci: Int, off: Int): Boolean = {
      if (!refine) {
        val t = decodeHuff(br, dcTbl(st.comps(ci).td))
        if (t < 0 || t > 15) return false
        val diffBits = if (t == 0) 0 else br.receive(t)
        if (diffBits == Int.MinValue) return false
        dcPred(ci) += extend(diffBits, t)
        st.coefs(ci)(off) = dcPred(ci) << al
      } else {
        val b = br.bit(); if (b < 0) return false
        if (b == 1) st.coefs(ci)(off) |= p1
      }
      true
    }
    def acFirstUnit(ci: Int, off: Int): Boolean = {
      val coefs = st.coefs(ci)
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = decodeHuff(br, acTbl(st.comps(ci).ta))
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = br.receive(r); if (eb == Int.MinValue) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val vb = br.receive(s); if (vb == Int.MinValue) return false
          coefs(off + k) = extend(vb, s) << al
          k += 1
        }
      }
      true
    }
    def acRefineUnit(ci: Int, off: Int): Boolean = {
      val coefs = st.coefs(ci)
      var k = ss
      if (eobrun == 0) {
        var brk = false
        while (k <= se && !brk) {
          val rs = decodeHuff(br, acTbl(st.comps(ci).ta))
          if (rs < 0) return false
          var r = rs >> 4; val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) { // EOBn: corrections continue below, then run starts
              eobrun = 1 << r
              if (r > 0) {
                val eb = br.receive(r); if (eb == Int.MinValue) return false
                eobrun += eb
              }
              brk = true
            } // r == 15: ZRL — sixteen zero-history positions to pass
          } else {
            if (s != 1) return false
            val b = br.bit(); if (b < 0) return false
            newval = if (b == 1) p1 else -p1
          }
          if (!brk) {
            // advance over r zero-history coefficients, emitting correction
            // bits for every nonzero-history one passed (G.1.2.3)
            var done = false
            while (!done) {
              if (k > se) return false
              val c = coefs(off + k)
              if (c != 0) {
                val b = br.bit(); if (b < 0) return false
                if (b == 1 && (c & p1) == 0)
                  coefs(off + k) = c + (if (c >= 0) p1 else -p1)
              } else {
                if (r == 0) { if (s != 0) coefs(off + k) = newval; done = true }
                else r -= 1
              }
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // the EOB run's correction tail: remaining nonzero-history coeffs
        while (k <= se) {
          val c = coefs(off + k)
          if (c != 0) {
            val b = br.bit(); if (b < 0) return false
            if (b == 1 && (c & p1) == 0)
              coefs(off + k) = c + (if (c >= 0) p1 else -p1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def unit(ci: Int, off: Int): Boolean =
      if (dcScan) dcUnit(ci, off)
      else if (!refine) acFirstUnit(ci, off)
      else acRefineUnit(ci, off)

    // table presence: DC first needs its DC table; AC scans their AC table;
    // DC refinement is raw bits (no table — T.81 G.1.2.1)
    if (dcScan && !refine && sel.exists(ci => dcTbl(st.comps(ci).td) == null))
      return None
    if (!dcScan && acTbl(st.comps(sel(0)).ta) == null) return None

    var rstIdx = 0
    var units = 0
    def restartBoundary(): Boolean = {
      if (restartInterval > 0 && units > 0 && units % restartInterval == 0) {
        if (!br.consumeRestart(0xd0 + rstIdx)) return false
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
      true
    }
    if (dcScan && ns > 1) {
      // interleaved MCU walk (DC scans only may interleave)
      var mcu = 0
      val nMcus = st.mcusX * st.mcusY
      while (mcu < nMcus) {
        if (!restartBoundary()) return None
        val my = mcu / st.mcusX; val mx = mcu % st.mcusX
        var si = 0
        while (si < ns) {
          val ci = sel(si); val c = st.comps(ci)
          var bv = 0
          while (bv < c.v) {
            var bx = 0
            while (bx < c.h) {
              val blk = (my * c.v + bv) * st.bw(ci) + (mx * c.h + bx)
              if (!unit(ci, blk * 64)) return None
              bx += 1
            }
            bv += 1
          }
          si += 1
        }
        units += 1
        mcu += 1
      }
    } else {
      // single-component walk over the component's OWN grid
      val ci = sel(0)
      var by = 0
      while (by < st.bhN(ci)) {
        var bx = 0
        while (bx < st.bwN(ci)) {
          if (!restartBoundary()) return None
          if (!unit(ci, (by * st.bw(ci) + bx) * 64)) return None
          units += 1
          bx += 1
        }
        by += 1
      }
    }
    if (dcScan && !refine) sel.foreach(ci => st.dcSeen(ci) = true)
    // resynchronize on the next marker: pos sits at the 0xFF when the
    // reader already hit one, else scan past any padding bits/bytes
    var np = br.pos
    if (br.markerHit < 0) {
      while (np + 1 < bytes.length &&
        !((bytes(np) & 0xff) == 0xff && (bytes(np + 1) & 0xff) != 0)) np += 1
      if (np + 1 >= bytes.length) return None
    }
    Some(np)
  }

  /** Dequantize + IDCT + upsample + color-convert the accumulated
    * progressive coefficients — the same arithmetic as the baseline scan
    * (kept textually separate so the gated baseline path stays untouched).
    */
  private def reconstructProgressive(st: ProgState, qt: Array[Array[Int]],
                                     adobeTransform: Int): Option[Image] = {
    val comps = st.comps
    if (comps.exists(c => qt(c.tq) == null)) return None
    val planeW = st.bw.map(_ * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * st.bh(i) * 8)).toArray
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      val coefs = st.coefs(ci)
      var blk = 0
      val nBlk = st.bw(ci) * st.bh(ci)
      while (blk < nBlk) {
        val off = blk * 64
        var k = 0
        while (k < 64) {
          val nat = Zigzag(k)
          block(nat) = coefs(off + k).toDouble * q(nat)
          k += 1
        }
        var x = 0
        while (x < 8) {
          var vv = 0
          while (vv < 8) {
            var s0 = 0.0; var u = 0
            while (u < 8) { s0 += Cos(u)(x) * block(vv * 8 + u); u += 1 }
            tmp(vv * 8 + x) = s0
            vv += 1
          }
          x += 1
        }
        val pw = planeW(ci)
        val px0 = (blk % st.bw(ci)) * 8
        val py0 = (blk / st.bw(ci)) * 8
        var y = 0
        while (y < 8) {
          var x2 = 0
          while (x2 < 8) {
            var s1 = 0.0; var vv2 = 0
            while (vv2 < 8) { s1 += Cos(vv2)(y) * tmp(vv2 * 8 + x2); vv2 += 1 }
            val sample = StrictMath.round(s1 + 128.0).toInt
            planes(ci)((py0 + y) * pw + px0 + x2) =
              (if (sample < 0) 0 else if (sample > 255) 255 else sample).toByte
            x2 += 1
          }
          y += 1
        }
        blk += 1
      }
      ci += 1
    }
    val w = st.w; val h = st.h
    val nc = comps.length
    val outCh = if (nc == 1) 1 else 3
    val out = new Array[Byte](w * h * outCh)
    val toRgb = nc == 3 && adobeTransform != 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nc == 1) {
          out(y * w + x) = planes(0)(y * planeW(0) + x)
        } else {
          def samp(cj: Int): Int = {
            val c = comps(cj)
            val sy = y * c.v / st.vmax; val sx = x * c.h / st.hmax
            planes(cj)(sy * planeW(cj) + sx) & 0xff
          }
          val o = (y * w + x) * 3
          if (toRgb) {
            val yy = samp(0).toDouble
            val cb = samp(1) - 128.0
            val cr = samp(2) - 128.0
            def cl(v: Double): Byte = {
              val r = StrictMath.round(v).toInt
              (if (r < 0) 0 else if (r > 255) 255 else r).toByte
            }
            out(o) = cl(yy + 1.402 * cr)
            out(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
            out(o + 2) = cl(yy + 1.772 * cb)
          } else {
            out(o) = samp(0).toByte; out(o + 1) = samp(1).toByte
            out(o + 2) = samp(2).toByte
          }
        }
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, outCh, out))
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int,
                         comps: Array[Component], w: Int, h: Int,
                         qt: Array[Array[Int]], dcTbl: Array[HuffTable],
                         acTbl: Array[HuffTable], restartInterval: Int,
                         adobeTransform: Int): Option[Image] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    if (comps.exists(c => hmax % c.h != 0 || vmax % c.v != 0)) return None
    if (comps.exists(c => qt(c.tq) == null || dcTbl(c.td) == null ||
      acTbl(c.ta) == null)) return None
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component plane, padded to the MCU grid
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * mcusY * 8 * comps(i).v)).toArray
    val dcPred = new Array[Int](comps.length)
    val br = new BitReader(bytes, scanStart)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.consumeRestart(0xd0 + rstIdx)) return None
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            // -------- one data unit (T.81 F.2.2)
            java.util.Arrays.fill(block, 0.0)
            val t = decodeHuff(br, dcTbl(c.td))
            if (t < 0 || t > 15) return None
            val diffBits = if (t == 0) 0 else br.receive(t)
            if (diffBits == Int.MinValue) return None
            dcPred(ci) += extend(diffBits, t)
            block(0) = dcPred(ci).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, acTbl(c.ta))
              if (rs < 0) return None
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return None
                val vb = br.receive(s)
                if (vb == Int.MinValue) return None
                block(Zigzag(k)) = extend(vb, s).toDouble * q(Zigzag(k))
                k += 1
              }
            }
            // -------- separable IDCT: rows then columns of the basis
            var x = 0
            while (x < 8) {
              var vv = 0
              while (vv < 8) {
                var s0 = 0.0; var u = 0
                while (u < 8) { s0 += Cos(u)(x) * block(vv * 8 + u); u += 1 }
                tmp(vv * 8 + x) = s0
                vv += 1
              }
              x += 1
            }
            val pw = planeW(ci)
            val px0 = (mx * c.h + bh) * 8
            val py0 = (my * c.v + bv) * 8
            var y = 0
            while (y < 8) {
              var x2 = 0
              while (x2 < 8) {
                var s1 = 0.0; var vv2 = 0
                while (vv2 < 8) { s1 += Cos(vv2)(y) * tmp(vv2 * 8 + x2); vv2 += 1 }
                val sample = StrictMath.round(s1 + 128.0).toInt
                planes(ci)((py0 + y) * pw + px0 + x2) =
                  (if (sample < 0) 0 else if (sample > 255) 255 else sample).toByte
                x2 += 1
              }
              y += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // -------- upsample (sample replication) + color convert
    val nc = comps.length
    val outCh = if (nc == 1) 1 else 3
    val out = new Array[Byte](w * h * outCh)
    val toRgb = nc == 3 && adobeTransform != 0 // JFIF YCbCr unless Adobe RGB
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nc == 1) {
          out(y * w + x) = planes(0)(y * planeW(0) + x)
        } else {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            val sy = y * c.v / vmax; val sx = x * c.h / hmax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val o = (y * w + x) * 3
          if (toRgb) {
            val yy = samp(0).toDouble
            val cb = samp(1) - 128.0
            val cr = samp(2) - 128.0
            def cl(v: Double): Byte = {
              val r = StrictMath.round(v).toInt
              (if (r < 0) 0 else if (r > 255) 255 else r).toByte
            }
            out(o) = cl(yy + 1.402 * cr)
            out(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
            out(o + 2) = cl(yy + 1.772 * cb)
          } else {
            out(o) = samp(0).toByte; out(o + 1) = samp(1).toByte
            out(o + 2) = samp(2).toByte
          }
        }
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, outCh, out))
  }

  // ---------------------------------------------------------------- encode

  // T.81 Annex K.1 — the example quantization tables every "standard
  // quality" encoder scales
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // T.81 Annex K.3 — the typical Huffman tables (BITS, HUFFVAL)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol from the canonical (BITS, HUFFVAL) pair. */
  private def encodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { out(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad to the byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) {
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xff) out.write(0)
      buf = 0; cnt = 0
    }
  }

  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Encode an interleaved 8-bit raster (channels 1 or 3) as baseline JPEG:
    * JFIF APP0, scaled Annex-K quant tables, Annex-K typical Huffman
    * tables, optional 4:2:0 subsampling (3-channel only) and restart
    * intervals. Deterministic bytes for deterministic input.
    */
  def encode(img: Image, quality: Int = 75, subsample420: Boolean = false,
             restartInterval: Int = 0): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(ch == 1 || ch == 3, s"jpeg encode: channels=$ch")
    require(w > 0 && h > 0 && px.length == w * h * ch,
      s"jpeg encode: ${px.length} bytes for ${w}x${h}x$ch")
    val qLum = scaleQ(QLum, quality)
    val qChrom = scaleQ(QChrom, quality)
    val sub = subsample420 && ch == 3
    val hs = if (sub) 2 else 1 // luma sampling factors (chroma always 1,1)
    // ---- component planes (level-shifted not here; FDCT subtracts 128)
    val nc = ch
    val compW = Array.tabulate(nc)(i => if (i == 0) w else (w + hs - 1) / hs)
    val compH = Array.tabulate(nc)(i => if (i == 0) h else (h + hs - 1) / hs)
    val planes = Array.tabulate(nc) { i =>
      val cw = compW(i); val chh = compH(i)
      val pl = new Array[Int](cw * chh)
      var y = 0
      while (y < chh) {
        var x = 0
        while (x < cw) {
          pl(y * cw + x) =
            if (ch == 1) px(y * w + x) & 0xff
            else if (!sub || i == 0) {
              // full-res sample (luma, or 4:4:4 chroma)
              val o = (math.min(y, h - 1) * w + math.min(x, w - 1)) * 3
              ycc(px, o, i)
            } else {
              // 4:2:0 chroma: average the 2x2 source block (edge-clamped)
              var s = 0; var n = 0
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val sy = math.min(2 * y + dy, h - 1)
                  val sx = math.min(2 * x + dx, w - 1)
                  s += ycc(px, (sy * w + sx) * 3, i); n += 1
                  dx += 1
                }
                dy += 1
              }
              (s + n / 2) / n
            }
          x += 1
        }
        y += 1
      }
      pl
    }
    // ---- header segments
    val out = new java.io.ByteArrayOutputStream(1024 + px.length / 4)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("ISO-8859-1")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 65 * (if (ch == 3) 2 else 1)) // DQT
    u8(0x00); Zigzag.foreach(i => u8(qLum(i)))
    if (ch == 3) { u8(0x01); Zigzag.foreach(i => u8(qChrom(i))) }
    marker(0xc0); u16(8 + 3 * nc) // SOF0
    u8(8); u16(h); u16(w); u8(nc)
    var ci = 0
    while (ci < nc) {
      u8(ci + 1)
      u8(if (ci == 0) (hs << 4) | hs else 0x11)
      u8(if (ci == 0) 0 else 1)
      ci += 1
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 17 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (ch == 3) {
      dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * nc) // SOS
    u8(nc)
    ci = 0
    while (ci < nc) {
      u8(ci + 1); u8(if (ci == 0) 0x00 else 0x11)
      ci += 1
    }
    u8(0); u8(63); u8(0)
    // ---- entropy-coded scan
    val dcEnc = Array(encodeTable(DcLumBits, DcLumVals),
      encodeTable(DcChromBits, DcChromVals))
    val acEnc = Array(encodeTable(AcLumBits, AcLumVals),
      encodeTable(AcChromBits, AcChromVals))
    val hmax = if (sub) 2 else 1
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * hmax - 1) / (8 * hmax)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nc)
    val freq = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      ci = 0
      while (ci < nc) {
        val (bh0, bv0) = if (ci == 0) (hmax, hmax) else (1, 1)
        val q = if (ci == 0) qLum else qChrom
        val tsel = if (ci == 0) 0 else 1
        var bv = 0
        while (bv < bv0) {
          var bh = 0
          while (bh < bh0) {
            val ox = (mx * bh0 + bh) * 8
            val oy = (my * bv0 + bv) * 8
            fdct(planes(ci), compW(ci), compH(ci), ox, oy, freq)
            // quantize in zigzag order and entropy-code (T.81 F.1.4)
            val dc = StrictMath.round(freq(0) / q(0)).toInt
            val diff = dc - dcPred(ci)
            dcPred(ci) = dc
            val t = magBits(diff)
            val (dcode, dlen) = dcEnc(tsel)(t)
            bw.put(dcode, dlen)
            if (t > 0) bw.put(ampBits(diff, t), t)
            var run = 0
            var k = 1
            while (k < 64) {
              val nat = Zigzag(k)
              val v = StrictMath.round(freq(nat) / q(nat)).toInt
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  val (zc, zl) = acEnc(tsel)(0xf0); bw.put(zc, zl); run -= 16
                }
                val s = magBits(v)
                val (acode, alen) = acEnc(tsel)((run << 4) | s)
                bw.put(acode, alen)
                bw.put(ampBits(v, s), s)
                run = 0
              }
              k += 1
            }
            if (run > 0) { val (ec, el) = acEnc(tsel)(0x00); bw.put(ec, el) }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive (SOF2) encoder — deterministic, minimal-script: one
    * interleaved DC first pass at Al=1, per-component spectral-selection
    * AC passes (bands [1..5] and [6..63], Al=0, per-block EOB — a run of
    * one is a legal EOB run), then a DC refinement pass emitting the
    * held-back bit. Exercises the decoder's interleaved-DC, successive-
    * approximation-DC, non-interleaved-band and EOB-run machinery with
    * reproducible bytes (the driver-gate fixture source); the AC
    * successive-approximation legs are cross-validated against
    * javax.imageio's progressive writer in JpegSpec instead (its standard
    * script emits them).
    */
  def encodeProgressive(img: Image, quality: Int = 75,
                        subsample420: Boolean = false): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(ch == 1 || ch == 3, s"jpeg encodeProgressive: channels=$ch")
    require(w > 0 && h > 0 && px.length == w * h * ch,
      s"jpeg encodeProgressive: ${px.length} bytes for ${w}x${h}x$ch")
    val qLum = scaleQ(QLum, quality)
    val qChrom = scaleQ(QChrom, quality)
    val sub = subsample420 && ch == 3
    val hs = if (sub) 2 else 1
    val nc = ch
    val compW = Array.tabulate(nc)(i => if (i == 0) w else (w + hs - 1) / hs)
    val compH = Array.tabulate(nc)(i => if (i == 0) h else (h + hs - 1) / hs)
    val planes = Array.tabulate(nc) { i =>
      val cw = compW(i); val chh = compH(i)
      val pl = new Array[Int](cw * chh)
      var y = 0
      while (y < chh) {
        var x = 0
        while (x < cw) {
          pl(y * cw + x) =
            if (ch == 1) px(y * w + x) & 0xff
            else if (!sub || i == 0) ycc(px,
              (math.min(y, h - 1) * w + math.min(x, w - 1)) * 3, i)
            else {
              var s = 0; var n = 0
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val sy = math.min(2 * y + dy, h - 1)
                  val sx = math.min(2 * x + dx, w - 1)
                  s += ycc(px, (sy * w + sx) * 3, i); n += 1
                  dx += 1
                }
                dy += 1
              }
              (s + n / 2) / n
            }
          x += 1
        }
        y += 1
      }
      pl
    }
    // ---- quantized coefficients, full padded grid, zigzag order
    val hmax = if (sub) 2 else 1
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * hmax - 1) / (8 * hmax)
    val bwF = Array.tabulate(nc)(i => if (i == 0) mcusX * hmax else mcusX)
    val bhF = Array.tabulate(nc)(i => if (i == 0) mcusY * hmax else mcusY)
    val bwN = Array.tabulate(nc)(i => (compW(i) + 7) / 8)
    val bhN = Array.tabulate(nc)(i => (compH(i) + 7) / 8)
    val coefs = Array.tabulate(nc)(i => new Array[Int](bwF(i) * bhF(i) * 64))
    val freq = new Array[Double](64)
    var ci = 0
    while (ci < nc) {
      val q = if (ci == 0) qLum else qChrom
      var by = 0
      while (by < bhF(ci)) {
        var bx = 0
        while (bx < bwF(ci)) {
          fdct(planes(ci), compW(ci), compH(ci), bx * 8, by * 8, freq)
          val off = (by * bwF(ci) + bx) * 64
          var k = 0
          while (k < 64) {
            val nat = Zigzag(k)
            coefs(ci)(off + k) = StrictMath.round(freq(nat) / q(nat)).toInt
            k += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    // ---- headers
    val out = new java.io.ByteArrayOutputStream(1024 + px.length / 4)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("ISO-8859-1")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 65 * (if (ch == 3) 2 else 1))
    u8(0x00); Zigzag.foreach(i => u8(qLum(i)))
    if (ch == 3) { u8(0x01); Zigzag.foreach(i => u8(qChrom(i))) }
    marker(0xc2); u16(8 + 3 * nc) // SOF2
    u8(8); u16(h); u16(w); u8(nc)
    ci = 0
    while (ci < nc) {
      u8(ci + 1)
      u8(if (ci == 0) (hs << 4) | hs else 0x11)
      u8(if (ci == 0) 0 else 1)
      ci += 1
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 17 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (ch == 3) {
      dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    }
    val dcEnc = Array(encodeTable(DcLumBits, DcLumVals),
      encodeTable(DcChromBits, DcChromVals))
    val acEnc = Array(encodeTable(AcLumBits, AcLumVals),
      encodeTable(AcChromBits, AcChromVals))
    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2 * comps.length)
      u8(comps.length)
      comps.foreach { i =>
        u8(i + 1); u8(if (i == 0) 0x00 else 0x11)
      }
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    // scan 1: interleaved DC first pass, Al = 1 (point transform >> 1)
    sos(0 until nc, 0, 0, 0, 1)
    locally {
      val bw2 = new BitWriter(out)
      val dcPred = new Array[Int](nc)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val my = mcu / mcusX; val mx = mcu % mcusX
        var cj = 0
        while (cj < nc) {
          val (bh0, bv0) = if (cj == 0) (hmax, hmax) else (1, 1)
          val tsel = if (cj == 0) 0 else 1
          var bv = 0
          while (bv < bv0) {
            var bx = 0
            while (bx < bh0) {
              val blk = (my * bv0 + bv) * bwF(cj) + (mx * bh0 + bx)
              val dc = coefs(cj)(blk * 64) >> 1 // arithmetic: T.81 A.4
              val diff = dc - dcPred(cj)
              dcPred(cj) = dc
              val t = magBits(diff)
              val (dcode, dlen) = dcEnc(tsel)(t)
              bw2.put(dcode, dlen)
              if (t > 0) bw2.put(ampBits(diff, t), t)
              bx += 1
            }
            bv += 1
          }
          cj += 1
        }
        mcu += 1
      }
      bw2.flush()
    }
    // scans 2..: per-component AC bands [1..5], then [6..63], Al = 0
    for (band <- Seq((1, 5), (6, 63)); cj <- 0 until nc) {
      val (ss, se) = band
      sos(Seq(cj), ss, se, 0, 0)
      val bw2 = new BitWriter(out)
      val tsel = if (cj == 0) 0 else 1
      var by = 0
      while (by < bhN(cj)) {
        var bx = 0
        while (bx < bwN(cj)) {
          val off = (by * bwF(cj) + bx) * 64
          var run = 0
          var k = ss
          while (k <= se) {
            val v = coefs(cj)(off + k)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acEnc(tsel)(0xf0); bw2.put(zc, zl); run -= 16
              }
              val s = magBits(v)
              val (ac, alen) = acEnc(tsel)((run << 4) | s)
              bw2.put(ac, alen)
              bw2.put(ampBits(v, s), s)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acEnc(tsel)(0x00); bw2.put(ec, el) }
          bx += 1
        }
        by += 1
      }
      bw2.flush()
    }
    // final scan: interleaved DC refinement (Ah=1, Al=0) — the held bit
    sos(0 until nc, 0, 0, 1, 0)
    locally {
      val bw2 = new BitWriter(out)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val my = mcu / mcusX; val mx = mcu % mcusX
        var cj = 0
        while (cj < nc) {
          val (bh0, bv0) = if (cj == 0) (hmax, hmax) else (1, 1)
          var bv = 0
          while (bv < bv0) {
            var bx = 0
            while (bx < bh0) {
              val blk = (my * bv0 + bv) * bwF(cj) + (mx * bh0 + bx)
              bw2.put(coefs(cj)(blk * 64) & 1, 1)
              bx += 1
            }
            bv += 1
          }
          cj += 1
        }
        mcu += 1
      }
      bw2.flush()
    }
    marker(0xd9)
    out.toByteArray
  }

  /** JFIF RGB→YCbCr, one channel of one pixel, rounded + clamped. */
  private def ycc(px: Array[Byte], o: Int, comp: Int): Int = {
    val r = px(o) & 0xff; val g = px(o + 1) & 0xff; val b = px(o + 2) & 0xff
    val v = comp match {
      case 0 => 0.299 * r + 0.587 * g + 0.114 * b
      case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    }
    val i = StrictMath.round(v).toInt
    if (i < 0) 0 else if (i > 255) 255 else i
  }

  /** Forward DCT of the 8x8 block at (ox, oy), edge-replicated past the
    * component bounds, level-shifted by -128. Output natural order.
    */
  private def fdct(plane: Array[Int], cw: Int, chh: Int, ox: Int, oy: Int,
                   out: Array[Double]): Unit = {
    val blk = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(oy + y, chh - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(ox + x, cw - 1)
        blk(y * 8 + x) = plane(sy * cw + sx) - 128.0
        x += 1
      }
      y += 1
    }
    // F[v][u] = Σy c(v,y) Σx c(u,x) f(y,x) — same orthonormal basis as the
    // IDCT, transposed
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0; var x2 = 0
        while (x2 < 8) { s += Cos(u)(x2) * blk(y2 * 8 + x2); x2 += 1 }
        tmp(y2 * 8 + u) = s
        y2 += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0; var y3 = 0
        while (y3 < 8) { s += Cos(v)(y3) * tmp(y3 * 8 + u2); y3 += 1 }
        out(v * 8 + u2) = s
        u2 += 1
      }
      v += 1
    }
  }

  /** Magnitude category (SSSS): bit length of |v|. */
  private def magBits(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Amplitude bits: v for positive, v-1 in t low bits for negative
    * (one's-complement form, T.81 F.1.2.1.3).
    */
  private def ampBits(v: Int, t: Int): Int =
    if (v >= 0) v else (v - 1) & ((1 << t) - 1)
}
