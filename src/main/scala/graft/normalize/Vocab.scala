package graft.normalize

/** Reference rule tables (pure data, cited per list).
  *
  * These constant tables ARE the semantics of the normalization rules —
  * they are copied verbatim from the reference because matching its
  * results requires the exact term sets, not because of its
  * implementation.
  */
object Vocab {

  /** Cross-label dedup priority, highest first —
    * postprocessing/normalizer.py:87-100.
    */
  val LabelPriority: Seq[String] = Seq(
    "Standard", "Organization", "Tool", "Industry", "Role", "Methodology",
    "Concept", "Outcome", "Artifact", "Processstage", "Bestpractice",
    "Challenge")

  /** Generic terms deleted outright — postprocessing/entity_cleanup.py:43-144. */
  val GenericTermsToDelete: Set[String] = Set(
    "tool", "tools", "software", "solution", "solutions", "platform",
    "platforms", "system", "systems", "application", "applications",
    "product", "products",
    "method", "methods", "process", "processes", "approach", "approaches",
    "technique", "techniques", "practice", "practices", "procedure",
    "procedures",
    "document", "documents", "file", "files", "report", "reports",
    "person", "people", "user", "users", "team", "teams", "member",
    "members",
    "thing", "things", "item", "items", "element", "elements", "component",
    "components", "part", "parts", "type", "types", "kind", "kinds", "way",
    "ways", "step", "steps", "stage", "stages", "phase", "phases", "level",
    "levels", "area", "areas", "aspect", "aspects", "factor", "factors",
    "feature", "features", "function", "functions", "activity",
    "activities", "task", "tasks", "action", "actions", "work", "result",
    "results", "outcome", "outcomes", "output", "outputs", "input",
    "inputs", "data", "information", "content", "resource", "resources",
    "material", "materials")

  /** Static plural→singular map — postprocessing/entity_cleanup.py:153-234. */
  val PluralToSingular: Map[String, String] = Map(
    "requirements" -> "requirement", "specifications" -> "specification",
    "constraints" -> "constraint", "baselines" -> "baseline",
    "traceabilities" -> "traceability", "dependencies" -> "dependency",
    "attributes" -> "attribute", "properties" -> "property",
    "criteria" -> "criterion",
    "stakeholders" -> "stakeholder", "engineers" -> "engineer",
    "developers" -> "developer", "analysts" -> "analyst",
    "architects" -> "architect", "testers" -> "tester",
    "reviewers" -> "reviewer", "managers" -> "manager",
    "customers" -> "customer", "suppliers" -> "supplier",
    "artifacts" -> "artifact", "deliverables" -> "deliverable",
    "diagrams" -> "diagram", "models" -> "model",
    "prototypes" -> "prototype", "templates" -> "template",
    "checklists" -> "checklist", "matrices" -> "matrix",
    "standards" -> "standard", "regulations" -> "regulation",
    "guidelines" -> "guideline", "frameworks" -> "framework",
    "methodologies" -> "methodology", "workflows" -> "workflow",
    "challenges" -> "challenge", "risks" -> "risk", "issues" -> "issue",
    "defects" -> "defect", "bugs" -> "bug", "errors" -> "error",
    "failures" -> "failure",
    "tests" -> "test", "cases" -> "case", "scenarios" -> "scenario",
    "reviews" -> "review", "inspections" -> "inspection",
    "audits" -> "audit", "validations" -> "validation",
    "verifications" -> "verification",
    "integrations" -> "integration", "interfaces" -> "interface",
    "apis" -> "api", "plugins" -> "plugin", "extensions" -> "extension",
    "modules" -> "module",
    "changes" -> "change", "updates" -> "update", "versions" -> "version",
    "releases" -> "release", "iterations" -> "iteration",
    "sprints" -> "sprint", "milestones" -> "milestone",
    "objectives" -> "objective", "goals" -> "goal", "metrics" -> "metric",
    "measurements" -> "measurement", "assessments" -> "assessment",
    "evaluations" -> "evaluation", "decisions" -> "decision",
    "approvals" -> "approval", "notifications" -> "notification",
    "alerts" -> "alert", "warnings" -> "warning")

  /** First-word markers of mislabeled Challenges —
    * postprocessing/entity_cleanup.py:238-273.
    */
  val PositiveOutcomeWords: Set[String] = Set(
    "high-quality", "quality", "satisfaction", "success", "successful",
    "efficient", "efficiency", "effective", "effectiveness", "improved",
    "improvement", "reduced", "reduction", "faster", "better", "optimal",
    "reliable", "reliability", "safe", "safety", "secure", "security",
    "compliant", "compliance", "innovation", "innovative", "productivity",
    "performance", "achievement", "benefit", "advantage")

  /** Industry variant → canonical name —
    * postprocessing/industry_taxonomy.py:28-150. Insertion order matters:
    * fuzzy ties resolve to the FIRST key (rapidfuzz process.extractOne
    * over dict keys).
    */
  val IndustryTaxonomy: Seq[(String, String)] = Seq(
    "aerospace" -> "aerospace", "aerospace industry" -> "aerospace",
    "aviation" -> "aerospace", "commercial aviation" -> "aerospace",
    "aerospace and defense" -> "aerospace",
    "aerospace & defense" -> "aerospace", "a&d" -> "aerospace",
    "defense" -> "defense", "defense industry" -> "defense",
    "military" -> "defense", "defense & aerospace" -> "defense",
    "automotive" -> "automotive", "automotive industry" -> "automotive",
    "automobile" -> "automotive", "automobiles" -> "automotive",
    "auto industry" -> "automotive", "vehicle" -> "automotive",
    "vehicles" -> "automotive", "car" -> "automotive",
    "cars" -> "automotive", "autonomous vehicles" -> "automotive",
    "electric vehicles" -> "automotive", "ev" -> "automotive",
    "medical devices" -> "medical devices",
    "medical device" -> "medical devices", "med device" -> "medical devices",
    "med devices" -> "medical devices", "medtech" -> "medical devices",
    "medical technology" -> "medical devices",
    "healthcare devices" -> "medical devices", "medical" -> "medical devices",
    "healthcare" -> "healthcare", "health care" -> "healthcare",
    "life sciences" -> "life sciences", "pharmaceutical" -> "life sciences",
    "pharmaceuticals" -> "life sciences", "pharma" -> "life sciences",
    "biopharma" -> "life sciences", "biotech" -> "life sciences",
    "biotechnology" -> "life sciences",
    "pharmaceutical manufacturing" -> "life sciences",
    "dentistry" -> "healthcare",
    "industrial" -> "industrial equipment",
    "industrial equipment" -> "industrial equipment",
    "industrial machinery" -> "industrial equipment",
    "industrial manufacturing" -> "manufacturing",
    "heavy equipment" -> "industrial equipment",
    "machinery" -> "industrial equipment",
    "manufacturing" -> "manufacturing",
    "manufacturing industry" -> "manufacturing",
    "discrete manufacturing" -> "manufacturing",
    "process manufacturing" -> "manufacturing",
    "semiconductor manufacturing" -> "semiconductor",
    "consumer electronics" -> "consumer electronics",
    "electronics" -> "consumer electronics",
    "consumer goods" -> "consumer goods",
    "consumer products" -> "consumer goods",
    "food and beverage" -> "consumer goods",
    "food & beverage" -> "consumer goods",
    "energy" -> "energy", "energy industry" -> "energy",
    "oil and gas" -> "energy", "oil & gas" -> "energy",
    "utilities" -> "utilities", "power generation" -> "utilities",
    "nuclear" -> "nuclear", "nuclear energy" -> "nuclear",
    "nuclear industry" -> "nuclear",
    "rail" -> "rail", "railway" -> "rail", "railroad" -> "rail",
    "rail industry" -> "rail",
    "transportation" -> "transportation", "transport" -> "transportation",
    "logistics" -> "transportation",
    "marine" -> "marine", "maritime" -> "marine",
    "shipbuilding" -> "marine",
    "semiconductor" -> "semiconductor", "semiconductors" -> "semiconductor",
    "chip industry" -> "semiconductor",
    "telecommunications" -> "telecommunications",
    "telecom" -> "telecommunications", "telco" -> "telecommunications",
    "communications" -> "telecommunications",
    "financial services" -> "financial services",
    "finance" -> "financial services", "financial" -> "financial services",
    "banking" -> "financial services", "fintech" -> "financial services",
    "insurance" -> "financial services",
    "space" -> "space", "space industry" -> "space",
    "space systems" -> "space", "satellite" -> "space",
    "satellites" -> "space",
    "government" -> "government", "public sector" -> "government",
    "federal" -> "government",
    "aec" -> "construction", "architecture" -> "construction",
    "construction" -> "construction",
    "engineering construction" -> "construction",
    "software" -> "software", "software industry" -> "software",
    "saas" -> "software")

  /** Industry-labeled names that are really concepts —
    * postprocessing/industry_taxonomy.py:156-186.
    */
  val ConceptsNotIndustries: Set[String] = Set(
    "artificial intelligence", "automation", "digital transformation",
    "e-commerce", "iot", "internet of things", "machine learning", "ai",
    "ml",
    "software development", "product development", "systems development",
    "systems and software engineering", "engineering",
    "software factories", "workforce software",
    "consumer product development",
    "quality", "safety", "safety-critical", "sustainability",
    "global supply chain", "supply chain")

  /** Industry-labeled names that are really organizations —
    * postprocessing/industry_taxonomy.py:192-221.
    */
  val OrganizationsNotIndustries: Set[String] = Set(
    "iso", "iec", "ieee", "rtca", "sae", "ecss", "cenelec", "incose",
    "fda", "faa", "easa",
    "tüv süd", "tuv sud", "tüv rheinland", "ul", "sgs", "bureau veritas",
    "intertek",
    "nasa", "pmi", "jama software", "nikola", "finnish red cross")

  /** Generic industry names deleted — industry_taxonomy.py:227-240. */
  val IndustryGenericToDelete: Set[String] = Set(
    "industry", "industries", "general", "regulated", "regulated industry",
    "regulated industries", "regulated products", "multiple industries",
    "various industries", "other industries", "smbs", "ffrdc")

  /** Well-known Standard → Industry pairs —
    * postprocessing/mentioned_in_backfill.py:25-47.
    */
  val StandardIndustryMap: Seq[(String, String)] = Seq(
    "iso 26262" -> "automotive", "iso 21434" -> "automotive",
    "a-spice" -> "automotive",
    "do-178c" -> "aerospace", "do-254" -> "aerospace",
    "do-178b" -> "aerospace", "arp 4754a" -> "aerospace",
    "arp 4761" -> "aerospace",
    "iec 62304" -> "medical devices", "iso 13485" -> "medical devices",
    "iso 14971" -> "medical devices",
    "iec 61508" -> "industrial automation",
    "iec 61511" -> "industrial automation",
    "iso 15288" -> "systems engineering",
    "iso/iec 12207" -> "software development",
    "ieee 830" -> "software development",
    "ieee 29148" -> "software development",
    "en 50128" -> "rail", "en 50129" -> "rail",
    "ecss-e-st-40c" -> "space", "ecss-q-st-80c" -> "space")

  /** Canonical industries = sorted distinct taxonomy values —
    * industry_taxonomy.py:243 (`CANONICAL_INDUSTRIES`). 18 names; the
    * validation gate allows ≤19 (validation/queries.py:660).
    */
  val CanonicalIndustries: Seq[String] =
    IndustryTaxonomy.map(_._2).distinct.sorted
}
