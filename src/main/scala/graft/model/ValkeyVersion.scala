package graft.model

/**
 * A `major.minor.patch` release identifier — the value space of the
 * reference's `search.emulate-release` compatibility knob
 * (reference vmsdk ValkeyVersion; valkey_search_options.h:161-197 and
 * COMPATIBILITY.md "Compatibility Defects"): each compatibility-bug
 * fix is gated on `emulate-release >= fix_version`, so pinning the
 * knob to an older release re-enables the legacy (incompatible)
 * behavior of every fix shipped after it.
 */
final case class ValkeyVersion(major: Int, minor: Int, patch: Int)
    extends Ordered[ValkeyVersion] {
  override def compare(that: ValkeyVersion): Int = {
    val m = major.compare(that.major)
    if (m != 0) m
    else {
      val n = minor.compare(that.minor)
      if (n != 0) n else patch.compare(that.patch)
    }
  }
  override def toString: String = s"$major.$minor.$patch"
}

object ValkeyVersion {
  /** Oldest release whose behavior can be emulated
    * (valkey_search_options.cc:737 kEmulateReleaseMin). */
  val Min: ValkeyVersion = ValkeyVersion(1, 0, 0)

  /** Newest fix version this engine implements: the 1.2.1 expression
    * fixes (value.cc) plus the 1.3.0 invalid-data whole-key drop
    * (index_schema.cc:713-727). The emulate-release ceiling — one
    * cannot emulate the future (valkey_search_options.cc:739-746). */
  val Module: ValkeyVersion = ValkeyVersion(1, 3, 0)

  /** Strict `major.minor.patch` decimal parse. */
  def parse(s: String): Option[ValkeyVersion] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 3) None
    else for {
      maj <- parts(0).toIntOption
      min <- parts(1).toIntOption
      pat <- parts(2).toIntOption
      if maj >= 0 && min >= 0 && pat >= 0
    } yield ValkeyVersion(maj, min, pat)
  }
}
