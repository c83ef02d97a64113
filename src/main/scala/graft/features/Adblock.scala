package graft.features

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adblock-Plus filter-rule matching — the subset the reference exercises
  * through adblockparser (/root/reference/code/labelling/node_labelling.py:
  * 22-91 and filterlists.py:61-91): blocking and `@@` exception rules,
  * `||` host anchors, `|` start/end anchors, `*` wildcards, `^` separators,
  * and the option set the reference passes (`third-party`, `script`,
  * `image`, `stylesheet`, `xmlhttprequest`, `subdocument`, `domain=`).
  *
  * The pattern→regex translation follows the public Adblock Plus filter
  * syntax (as implemented by the open-source `adblockparser` library the
  * reference depends on): escape regex metacharacters, `^` → separator
  * class (anything but letter/digit/`_-.%`, or end of address), `*` → `.*`,
  * trailing `|` → `$`, leading `||` → optional scheme + subdomain prefix,
  * leading `|` → `^`.
  *
  * Rules are compiled ONCE on the driver and shipped inside a UDF closure
  * (a broadcast variable in spirit — filter lists are a few thousand rules,
  * always the small dimension at corpus scale). Element-hiding rules,
  * comments, and rules with options outside the supported set are skipped,
  * mirroring the reference's use (it only ever queries the options above).
  */
object Adblock {

  /** Option constraints a rule carries. `typeOpts`: resource-type binary
    * options with their expected value; `thirdParty`: required third-party
    * state if constrained; `domains`: (negated?, domain) page-domain
    * constraints from `$domain=`. */
  final case class Rule(
      regex: Pattern, exception: Boolean,
      thirdParty: Option[Boolean],
      typeOpts: Map[String, Boolean],
      domains: Seq[(Boolean, String)])

  private val supportedTypes =
    Set("script", "image", "stylesheet", "xmlhttprequest", "subdocument")

  /** Adblock pattern → anchored regex (public ABP translation).
    * A `/re/`-delimited pattern is already a regex: pass it through
    * untouched (adblockparser `_rule_to_regex` head case). */
  private[features] def patternToRegex(raw: String): String = {
    if (raw.length > 1 && raw.startsWith("/") && raw.endsWith("/"))
      return raw.substring(1, raw.length - 1)
    var rule = raw
    val sb = new StringBuilder
    val endAnchor = rule.nonEmpty && rule.last == '|' &&
      !(rule.length == 1) // a lone "|" start-anchors an empty pattern
    if (endAnchor) rule = rule.dropRight(1)
    val (prefix, body) =
      if (rule.startsWith("||"))
        ("^(?:[^:/?#]+:)?(?://(?:[^/?#]*\\.)?)?", rule.drop(2))
      else if (rule.startsWith("|")) ("^", rule.drop(1))
      else ("", rule)
    sb.append(prefix)
    body.foreach {
      case '*' => sb.append(".*")
      case '^' => sb.append("(?:[^\\w\\-.%]|$)")
      case c if "\\.$+?{}()[]|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (endAnchor) sb.append('$')
    sb.toString
  }

  /** Parse one filter-list line; None for comments, element-hiding rules,
    * empty lines, and rules carrying unsupported options. */
  def parseRule(line0: String): Option[Rule] = {
    val line = line0.trim
    if (line.isEmpty || line.startsWith("!") || line.startsWith("[") ||
      line.contains("##") || line.contains("#@#")) return None
    val (exception, rest0) =
      if (line.startsWith("@@")) (true, line.drop(2)) else (false, line)
    // adblockparser splits at the FIRST '$' (rule_text.split('$', 1)) — a
    // '$' inside the URL pattern makes everything after it options
    val dollar = rest0.indexOf('$')
    val (pat, optStr) =
      if (dollar > 0) (rest0.substring(0, dollar), rest0.substring(dollar + 1))
      else (rest0, "")
    var thirdParty: Option[Boolean] = None
    var typeOpts = Map.empty[String, Boolean]
    var domains = Seq.empty[(Boolean, String)]
    if (optStr.nonEmpty) {
      optStr.split(',').foreach { o0 =>
        val o = o0.trim
        val neg = o.startsWith("~")
        val name = if (neg) o.drop(1) else o
        if (name == "third-party") thirdParty = Some(!neg)
        else if (supportedTypes.contains(name)) typeOpts += (name -> !neg)
        else if (name.startsWith("domain=") && !neg)
          domains = name.drop(7).split('|').toSeq
            .filter(_.nonEmpty)
            .map(d => (d.startsWith("~"), d.stripPrefix("~")))
        else if (name == "match-case") () // adblockparser ignores this option
        else return None // unsupported option: skip the whole rule
      }
    }
    if (pat.isEmpty) return None
    Some(Rule(Pattern.compile(patternToRegex(pat)), exception, thirdParty,
      typeOpts, domains))
  }

  def parseList(lines: Seq[String]): Seq[Rule] = lines.flatMap(parseRule)

  /** adblockparser `_domain_variants`: the domain then each parent suffix
    * down to two labels ("a.b.c.com" → a.b.c.com, b.c.com, c.com); a
    * single-label domain yields itself. */
  private[features] def domainVariants(domain: String): Seq[String] = {
    val parts = domain.split('.')
    if (parts.length <= 1) Seq(domain)
    else (parts.length to 2 by -1).map(i => parts.takeRight(i).mkString("."))
  }

  /** adblockparser `_domain_matches`: walk page-domain variants
    * most-specific-first; the FIRST variant present among the rule's
    * domains decides (its stored polarity), so a specific positive
    * overrides a broader negative. Fallback: match only when every rule
    * domain is negated. */
  private[features] def domainRulesMatch(
      pageDomain: String, domains: Seq[(Boolean, String)]): Boolean = {
    val byDomain = domains.map { case (neg, d) => d -> !neg }.toMap
    domainVariants(pageDomain).collectFirst {
      case v if byDomain.contains(v) => byDomain(v)
    }.getOrElse(!byDomain.values.exists(identity))
  }

  /** adblockparser option semantics: a rule is EVALUATED only when every
    * option KEY it carries is supplied by the caller's context — and the
    * reference's match_url supplies 'third-party' only for third-party
    * requests and a resource-type key only for that resource's own type
    * (node_labelling.py:37-91). Consequences faithfully kept: negated
    * third-party/type options (`$~third-party`, `$~script`) can never
    * match — the missing key makes the rule inapplicable instead;
    * `subdocument` is the one type key supplied for EVERY request (True
    * only for sub_frame), so `$~subdocument` does match non-subframes. */
  private def optionsOk(r: Rule, thirdParty: Boolean, pageDomain: String,
                        reqTypes: Set[String]): Boolean = {
    r.thirdParty match {
      case Some(v) =>
        if (!thirdParty) return false // key absent → rule not applicable
        if (!v) return false          // ~third-party vs supplied True
      case None => ()
    }
    val typesOk = r.typeOpts.forall { case (t, expected) =>
      if (t == "subdocument") reqTypes.contains("subdocument") == expected
      else reqTypes.contains(t) && expected // key absent → not applicable
    }
    if (!typesOk) return false
    if (r.domains.nonEmpty && !domainRulesMatch(pageDomain, r.domains))
      return false
    true
  }

  /** A rule list pre-compiled for the hot path, adblockparser-style: the
    * overwhelmingly-common OPTION-FREE rules fold into ONE alternation
    * Pattern per polarity (adblockparser's `blacklist_re`/`whitelist_re`),
    * so matching a URL costs two combined-regex scans plus a loop over
    * only the option-carrying minority — not O(|rules|) regex executions
    * per node. Semantics unchanged: an option-free rule's hit is exactly
    * its regex find, and find-of-union ≡ any-find. */
  final class CompiledRules(rules: Seq[Rule]) extends Serializable {
    private val (optFree, withOpts) = rules.partition(r =>
      r.thirdParty.isEmpty && r.typeOpts.isEmpty && r.domains.isEmpty)
    private def combined(rs: Seq[Rule]): Option[Pattern] =
      if (rs.isEmpty) None
      else Some(Pattern.compile(
        rs.map(r => "(?:" + r.regex.pattern + ")").mkString("|")))
    private val blockRe = combined(optFree.filterNot(_.exception))
    private val excRe = combined(optFree.filter(_.exception))
    private val blockOpt = withOpts.filterNot(_.exception)
    private val excOpt = withOpts.filter(_.exception)

    def shouldBlock(url: String, thirdParty: Boolean, pageDomain: String,
                    reqTypes: Set[String]): Boolean = {
      if (url == null) return false
      def hits(r: Rule): Boolean =
        r.regex.matcher(url).find() &&
          optionsOk(r, thirdParty, pageDomain, reqTypes)
      (blockRe.exists(_.matcher(url).find()) || blockOpt.exists(hits)) &&
        !(excRe.exists(_.matcher(url).find()) || excOpt.exists(hits))
    }

    def nodeBlocked(url: String, pageDomain: String, nodeDomain: String,
                    resourceType: String): Boolean = {
      if (pageDomain == null || nodeDomain == null) return false
      shouldBlock(url, pageDomain != nodeDomain, pageDomain,
        Adblock.requestTypes(resourceType))
    }
  }

  def compile(rules: Seq[Rule]): CompiledRules = new CompiledRules(rules)

  /** should_block: any blocking rule matches (pattern + options) and no
    * exception rule does. (Spec-facing convenience — compiles the combined
    * patterns per call; hot paths hold a [[CompiledRules]].) */
  def shouldBlock(rules: Seq[Rule], url: String, thirdParty: Boolean,
                  pageDomain: String, reqTypes: Set[String]): Boolean =
    new CompiledRules(rules).shouldBlock(url, thirdParty, pageDomain, reqTypes)

  /** Resource type → supplied ABP type-option keys (node_labelling.py
    * wiring). */
  private[features] def requestTypes(resourceType: String): Set[String] =
    Option(resourceType).getOrElse("") match {
      case "script" => Set("script")
      case "image" | "imageset" => Set("image")
      case "stylesheet" => Set("stylesheet")
      case "xmlhttprequest" => Set("xmlhttprequest")
      case "sub_frame" => Set("subdocument")
      case _ => Set.empty
    }

  /** The reference's per-node option wiring (node_labelling.py:37-91):
    * third-party = node domain ≠ page eTLD+1; resource-type option set from
    * the node's content_policy_type; subdocument for sub_frame.
    * (Spec-facing convenience — hot paths hold a [[CompiledRules]].) */
  def nodeBlocked(rules: Seq[Rule], url: String, pageDomain: String,
                  nodeDomain: String, resourceType: String): Boolean =
    new CompiledRules(rules).nodeBlocked(url, pageDomain, nodeDomain,
      resourceType)

  /** Label classifiable nodes against one or more compiled filter lists —
    * label = disjunction across lists (node_labelling.py:113-117); null
    * label where the reference emits "Error" (missing page/node domain).
    * Lists compile ONCE on the driver ([[CompiledRules]]) and ship in the
    * UDF closure. */
  def labelNodes(nodes: DataFrame, lists: Seq[Seq[Rule]]): DataFrame = {
    graft.ext.GraftExtensions.register(nodes.sparkSession)
    val compiled = lists.map(new CompiledRules(_))
    val blocked = udf((url: String, pageDom: String, nodeDom: String,
                       rt: String) =>
      if (pageDom == null || nodeDom == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(
        compiled.exists(_.nodeBlocked(url, pageDom, nodeDom, rt))))
    FeatureExtraction.classifiable(nodes)
      .select(col("visit_id"), col("top_level_url"), col("name"),
        blocked(col("name"), col("top_level_domain"), col("domain"),
          call_function("json_get", col("attr"), lit("content_policy_type")))
          .as("label"))
  }
}
