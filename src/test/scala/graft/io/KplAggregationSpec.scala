package graft.io

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The KPL aggregated-record codec against the PUBLISHED format: a
  * hand-computed golden byte vector (magic + protobuf + MD5), round
  * trips with shared key tables, the checksum/malformed rejection
  * contract, and forward-compatible unknown-field skipping. */
class KplAggregationSpec extends AnyFunSuite {
  import KplAggregation._

  private def ur(pk: String, data: String, ehk: Option[String] = None) =
    UserRecord(pk, ehk, data.getBytes(UTF_8))

  test("golden bytes: one record, hand-assembled protobuf + MD5") {
    // AggregatedRecord { partition_key_table: ["a"],
    //                    records: [{pk_index: 0, data: [0x2A]}] }
    // field 1 (string "a"):   0A 01 61
    // field 3 (Record):        1A 05 (08 00 1A 01 2A)
    val payload = Array(0x0A, 0x01, 0x61,
      0x1A, 0x05, 0x08, 0x00, 0x1A, 0x01, 0x2A).map(_.toByte)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload)
    val expected = Magic ++ payload ++ md5
    val actual = aggregate(Seq(UserRecord("a", None, Array(0x2A.toByte))))
    assert(actual.toSeq == expected.toSeq)
    assert(isAggregated(actual))
  }

  test("round trip: many records, deduplicated key tables, ehk optional") {
    val records = Vector(
      ur("alpha", "first line\nsecond line"),
      ur("beta", "payload-2", Some("170141183460469231731687303715884105728")),
      ur("alpha", "payload-3"), // pk table dedups to 2 entries
      ur("gamma", ""), // empty data survives
      ur("beta", "payload-5", Some("0")))
    val packed = aggregate(records)
    val Right(out) = deaggregate(packed)
    assert(out.map(r => (r.partitionKey, r.explicitHashKey,
      new String(r.data, UTF_8))) ==
      records.map(r => (r.partitionKey, r.explicitHashKey,
        new String(r.data, UTF_8))))
  }

  test("no magic = pass-through signal, never a parse attempt") {
    val plain = """{"type":"trip","id":1}""".getBytes(UTF_8)
    assert(!isAggregated(plain))
    assert(deaggregate(plain) == Left("no KPL magic prefix"))
    // a short buffer that happens to start like the magic is still
    // too short to BE aggregated (needs magic + md5 at minimum)
    assert(!isAggregated(Magic))
  }

  test("checksum mismatch and truncation are rejected with reasons") {
    val packed = aggregate(Seq(ur("k", "hello")))
    // flip one payload byte without updating the trailer MD5
    val corrupt = packed.clone()
    corrupt(Magic.length) = (corrupt(Magic.length) ^ 0x01).toByte
    assert(deaggregate(corrupt) == Left("MD5 checksum mismatch"))
    // truncate inside the protobuf, re-stamp a VALID md5 for the
    // truncated payload: structural parse must catch it
    val cut = packed.length - 17 // drop 1 protobuf byte
    val body = java.util.Arrays.copyOfRange(packed, Magic.length, cut)
    val restamped = Magic ++ body ++
      java.security.MessageDigest.getInstance("MD5").digest(body)
    assert(deaggregate(restamped).swap.getOrElse("")
      .startsWith("malformed aggregated record"))
  }

  test("out-of-range key index is rejected, not an exception") {
    // Record referencing pk_index 1 with a 1-entry table:
    // field1 "a" (0A 01 61), Record {pk_index: 1, data:[0x00]}
    val payload = Array(0x0A, 0x01, 0x61,
      0x1A, 0x05, 0x08, 0x01, 0x1A, 0x01, 0x00).map(_.toByte)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload)
    assert(deaggregate(Magic ++ payload ++ md5) ==
      Left("partition key index 1 out of range"))
  }

  test("unknown fields are skipped (forward compatibility with KPL tags)") {
    // same golden record plus an unknown varint field 7 (tag 0x38)
    // at the AggregatedRecord level and an unknown field 4 tag list
    // inside the Record (tag 0x22, len-delim) — a real KPL pack may
    // carry tags the schema subset here does not model
    val rec = Array(0x08, 0x00, // pk_index 0
      0x22, 0x02, 0x08, 0x01, // unknown len-delim field 4
      0x1A, 0x01, 0x2A).map(_.toByte) // data [0x2A]
    val payload = Array(0x0A, 0x01, 0x61).map(_.toByte) ++
      Array(0x38, 0x05).map(_.toByte) ++ // unknown varint field 7
      Array(0x1A, rec.length).map(_.toByte) ++ rec
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload)
    val Right(out) = deaggregate(Magic ++ payload ++ md5)
    assert(out.map(r => (r.partitionKey, r.data.toSeq)) ==
      Vector(("a", Seq(0x2A.toByte))))
  }
}
